package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2.8 stretch tier).
  *
  * [[TopKAgg]] is exact per-group top-k as an Aggregator: because Spark
  * plans Aggregators with partial aggregation, each map task keeps only a
  * k-element buffer per group and the shuffle carries k doubles per
  * (group × partition) — versus the window row_number() ≤ k formulation,
  * which shuffles EVERY row and sorts each group in full. At 100 TB that is
  * the difference between a k-sized and an n-sized shuffle.
  */
class TopKAgg(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  private def bound(s: Seq[Double]): Seq[Double] =
    s.sorted(Ordering[Double].reverse).take(k)

  override def zero: Seq[Double] = Nil
  override def reduce(b: Seq[Double], a: Double): Seq[Double] = bound(b :+ a)
  override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] = bound(x ++ y)
  override def finish(r: Seq[Double]): Seq[Double] = bound(r)

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
