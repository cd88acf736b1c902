package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class WindowsSpec extends SparkSpec {

  test("attribution conserves purchases and value; channels are the touch set") {
    val out = Windows.q_attribution.run(spark, sf("sf0.01")).collect()
    assert(out.nonEmpty)
    val purchases = Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
    // every purchase lands in exactly one channel bucket
    assert(out.map(_.getAs[Long]("n_purchases")).sum === purchases.count())
    // attributed revenue sums to total purchase revenue (DECIMAL-exact path)
    val total = purchases
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
      .head().getDecimal(0).doubleValue()
    val attributed = out.map(_.getAs[Double]("attributed_value")).sum
    assert(math.abs(attributed - total) < 1e-6)
    // only the declared channels can appear
    assert(out.map(_.getAs[String]("channel")).toSet.subsetOf(
      Set("click", "view", "direct")))
  }

  test("linear attribution conserves value to within truncation (< 2 micros/purchase)") {
    val out = Windows.q_attribution_linear.run(spark, sf("sf0.01")).collect()
    assert(out.map(_.getAs[String]("channel")).sorted.toSeq ===
      Seq("click", "direct", "view"))
    val purchases = Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
    val nP = purchases.count()
    val totalMicros = purchases
      .agg(sum((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long") * lit(10000L)))
      .head().getLong(0)
    val credited = out.map(_.getAs[Long]("credited_micros")).sum
    // each k>0 purchase loses < 1 micro per channel term to truncation
    assert(credited <= totalMicros)
    assert(credited >= totalMicros - 2 * nP)
  }
}
