package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class AnalyticsSpec extends SparkSpec {

  test("psiFromCounts (two-frame) equals the one-pass q_drift_psi formulation") {
    val ev = Tables.events(spark, sf())
    val boundary = java.time.LocalDateTime.parse("2024-01-16T00:00")
    val early = ev.filter(col("ts") < lit(boundary))
    val late = ev.filter(col("ts") >= lit(boundary))
    val twoFrame = Analytics.psiFromCounts(
      Analytics.bucketCounts(early), Analytics.bucketCounts(late))
      .select("event_type", "n_ref", "n_cur", "psi", "drifted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSet
    val onePass = graft.SparkEntry.queries("q_drift_psi")(spark, sf())
      .select("event_type", "n_early", "n_late", "psi", "drifted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSet
    // DECIMAL term sums make the psi doubles bit-identical, not just close
    assert(twoFrame === onePass)
    assert(twoFrame.nonEmpty)
  }

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

  test("decimal-sum moments agree with Spark's float aggregates to float tolerance") {
    // the decimal-power-sum formulation exists for cross-engine hash
    // stability; it must still compute the same statistics the built-in
    // float aggregates do, up to their own rounding
    val got = Analytics.q_stats_moments.run(spark, sf())
      .select("l_returnflag", "var_qty", "stddev_price", "corr_qty_price")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_extendedprice")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, (v, s, c)) =>
      val (rv, rs, rc) = ref(k)
      assert(math.abs(v - rv) / rv < 1e-9, s"$k var: $v vs $rv")
      assert(math.abs(s - rs) / rs < 1e-9, s"$k stddev: $s vs $rs")
      assert(math.abs(c - rc) < 1e-9, s"$k corr: $c vs $rc")
    }
  }

  test("deletion-neighborhood fuzzy join equals brute-force levenshtein <= 1") {
    val parts = Tables.part(spark, sf())
      .select(col("p_partkey"), lower(col("p_name")).as("name"))
    val probes = parts.filter(col("p_partkey") < 20)
      .select(col("p_partkey").as("probe_id"),
        concat(col("name").substr(lit(1), lit(2)),
          col("name").substr(lit(4), length(col("name")))).as("probe"))
    val brute = probes.crossJoin(parts)
      .filter(levenshtein(col("probe"), col("name")) <= 1)
      .select("probe_id", "p_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = Fuzzy.q_fuzzy_join.run(spark, sf())
      .select("probe_id", "p_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === brute, "SymSpell k=1 candidates must have exact recall")
    assert(fast.nonEmpty, "typo probes must match their source names")
  }

  test("MAD outlier audit equals a driver-side exact recompute") {
    val out = Analytics.q_outlier_mad.run(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    val rows = Tables.lineitem(spark, sf())
      .select("l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def quantile50(xs: Array[Double]): Double = {
      // quantile_cont / Spark percentile linear interpolation at p=0.5
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val (lo, hi) = (pos.toInt, math.ceil(pos).toInt)
      s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    val ref = rows.groupBy(_._1).map { case (g, vs) =>
      val xs = vs.map(_._2)
      val med = quantile50(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = quantile50(devs)
      g -> (xs.length.toLong, med, mad, devs.count(_ > 4.4478 * mad).toLong)
    }
    assert(out === ref)
    // TPC-H prices are light-tailed (products of uniforms): zero outliers at
    // the 3σ-equivalent threshold is the CORRECT answer here, and the ref
    // equality above still exercises the counting path. Pin that the
    // threshold is live by checking a planted spike trips it.
    import spark.implicits._
    val spiked = (rows.take(200).map(_._2) :+ 1e9)
      .toSeq.toDF("x").withColumn("g", lit("s"))
    val medS = quantile50(rows.take(200).map(_._2) :+ 1e9)
    val madS = quantile50((rows.take(200).map(_._2) :+ 1e9).map(x => math.abs(x - medS)))
    val fired = spiked.filter(abs(col("x") - lit(medS)) > lit(4.4478) * lit(madS)).count()
    assert(fired >= 1)
  }

  test("equi-depth histogram: near-equal buckets, ordered disjoint value spans") {
    val out = Analytics.q_histogram_equidepth.run(spark, sf("sf0.01")).collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq === (1L to 8L))
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total === Tables.orders(spark, sf("sf0.01")).count())
    // depth balance: every bucket within 20% of the ideal eighth
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(math.abs(n - total / 8.0) < 0.2 * total / 8.0,
        s"bucket ${r.getAs[Long]("bucket")} holds $n of $total")
    }
    // value spans are ordered and non-overlapping (cut points separate them)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("lo") <= a.getAs[Double]("hi"))
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
  }
}
