package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class AnalyticsSpec extends SparkSpec {

  test("gap-fill: contiguous hourly spine, zero-filled gaps, forward fill total") {
    val out = Analytics.q_ts_gapfill.run(spark, sf())
      // epoch-second cast sidesteps the NTZ/LTZ external-type split
      .withColumn("epoch", col("hour_start").cast("long"))
      .collect()
    assert(out.nonEmpty)
    val hours = out.map(_.getAs[Long]("epoch"))
    // spine is contiguous: every consecutive pair is exactly 1h apart
    hours.sliding(2).foreach {
      case Array(a, b) => assert(b - a == 3600L)
      case _           =>
    }
    // planted gaps exist and are zero-filled, never null
    assert(out.forall(!_.isNullAt(1)))
    // forward fill: non-null everywhere after the first observed hour
    assert(out.dropWhile(_.isNullAt(2)).forall(!_.isNullAt(2)))
  }

  test("hash sampling is uniform-ish within every stratum") {
    val out = Analytics.q_sample_hash.run(spark, sf("sf0.01")).collect()
    out.foreach { r =>
      val rate = r.getAs[Double]("sample_rate")
      // 1/16 = 0.0625 expected; binomial noise at stratum sizes >= ~2k
      assert(rate > 0.03 && rate < 0.10, s"stratum rate $rate far from 1/16")
    }
  }

  test("histogram conserves rows and mass") {
    val out = Analytics.q_histogram.run(spark, sf())
    val orders = Tables.orders(spark, sf())
    assert(out.agg(sum("n")).head().getLong(0) === orders.count())
    val sumBuckets = out.agg(sum("sum_price")).head().getDouble(0)
    val sumDirect = orders
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(sumBuckets - sumDirect) < 1e-6)
  }

  test("funnel counts are monotone non-increasing through the steps") {
    val r = Analytics.q_funnel.run(spark, sf("sf0.01")).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v -> $c -> $p")
    assert(v > 0)
  }

  test("percentile_approx (the 100 TB swap) tracks the exact percentiles") {
    // The gate query is exact (oracle-matchable); at scale you swap in the
    // mergeable GK sketch. Pin the swap's error here so it stays a swap.
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val both = li.groupBy("l_returnflag")
      .agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"),
      )
      .collect()
    both.foreach { r =>
      val rel = math.abs(r.getAs[Double]("approx") - r.getAs[Double]("exact")) /
        r.getAs[Double]("exact")
      assert(rel < 0.01, s"approx median off by ${rel * 100}%")
    }
  }
}
