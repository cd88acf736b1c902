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
}
