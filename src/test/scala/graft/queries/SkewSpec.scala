package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class SkewSpec extends SparkSpec {

  test("salted aggregation equals the direct groupBy") {
    val salted = Skew.q_skew_salted_agg.run(spark, sf())
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val direct = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted === direct)
  }

  test("approximate distinct count is within the configured error of exact") {
    val approx = Skew.q_approx_distinct.run(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx $a vs exact $e")
    }
  }
}
