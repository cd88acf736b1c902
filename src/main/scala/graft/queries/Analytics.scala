package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.{Q, Tables}

/** Dataset-profiling analytics a training-data pipeline runs before and
  * after every curation step: exact distribution quantiles, deterministic
  * hash sampling, multi-grain grouping-set summaries, histogram binning,
  * and time-series gap repair. All built-in expressions (codegen'd), all
  * oracle-checked.
  */
object Analytics {

  /** Exact interpolated percentiles per group. Spark's `percentile` is the
    * exact sort-based aggregate (one shuffle on the group key; the
    * per-group sort is distributed, not a driver sort) and matches DuckDB's
    * `quantile_cont` linear interpolation bit-for-bit on doubles. For the
    * 100 TB path swap in `percentile_approx` (GK sketch, mergeable,
    * bounded memory) — kept exact here because the oracle is exact.
    */
  val q_quantiles: Q = Q(
    "q_quantiles",
    Some("""
      SELECT l_returnflag,
             COUNT(*) AS n,
             quantile_cont(l_extendedprice, 0.25) AS p25,
             quantile_cont(l_extendedprice, 0.50) AS p50,
             quantile_cont(l_extendedprice, 0.75) AS p75,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """),
  ) { (s, d) =>
    // ONE array-form percentile aggregate: four scalar percentile calls
    // would each keep their own per-group value buffer (4x the aggregation
    // state and sort work); the array form shares one buffer.
    // Balanced when the scan is narrower than the core count (r17): the
    // percentile partial-state build is the compute-dense map side, and a
    // single-row-group file ran it as one 0.7 s task.
    graft.util.Balance.ifNarrow(Tables.lineitem(s, d), col("l_extendedprice"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.50), lit(0.75), lit(0.95))).as("ps"),
      )
      .select(
        col("l_returnflag"), col("n"),
        element_at(col("ps"), 1).as("p25"),
        element_at(col("ps"), 2).as("p50"),
        element_at(col("ps"), 3).as("p75"),
        element_at(col("ps"), 4).as("p95"),
      )
      // lazy checkpoint before the presentation sort (r17): the range
      // exchange samples its child, which re-ran the whole percentile
      // final merge (measured: two ~700 ms jobs reading the same agg
      // shuffle). Materializing the K-row agg output once turns the
      // second execution into block reads — at any scale the agg output
      // is groups-bounded, so the trade never inverts.
      .localCheckpoint(eager = false)
      .orderBy("l_returnflag")
  }

  /** Deterministic stratified hash sampling: a row is sampled iff the first
    * hex digit of md5(orderkey-linenumber) is '0' (rate 1/16). Hash-based
    * selection is the production sampling primitive — reproducible across
    * runs/engines, no RNG state, stable under repartition, and uniform
    * within every stratum. Output audits the realized rate per stratum.
    */
  val q_sample_hash: Q = Q(
    "q_sample_hash",
    Some("""
      WITH k AS (
        SELECT l_returnflag, l_linestatus,
               substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
                             || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0' AS sampled
        FROM lineitem
      )
      SELECT l_returnflag, l_linestatus,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE sampled) AS n_sampled,
             COUNT(*) FILTER (WHERE sampled) * 1.0 / COUNT(*) AS sample_rate
      FROM k
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """),
  ) { (s, d) =>
    val key = concat_ws("-", col("l_orderkey"), col("l_linenumber"))
    val sampled = substring(md5(key.cast(BinaryType)), 1, 1) === "0"
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        count(when(sampled, 1)).as("n_sampled"),
        (count(when(sampled, 1)) * lit(1.0) / count(lit(1))).as("sample_rate"),
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Deterministic train/val/test split — the assignment step every
    * training-data pipeline runs last: each document hashes (salted, so the
    * split is independent of every other hash use) into 80/10/10 by its
    * md5 prefix, compared as fixed-width hex STRINGS ('cc' = 204/256,
    * 'e6' = 230/256) — lexicographic equals numeric there, and string
    * comparison is engine-neutral where a hex→int cast is not. Stable under
    * any reordering, insertion, or re-partitioning of the corpus; per-split
    * token totals audit the balance.
    */
  val q_sample_split: Q = Q(
    "q_sample_split",
    Some("""
      WITH a AS (
        SELECT doc_id,
               substring(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 2) AS h,
               len(string_split_regex(text, '\s+')) AS nt
        FROM documents
      ), s AS (
        SELECT CASE WHEN h < 'cc' THEN 'train'
                    WHEN h < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               nt
        FROM a
      )
      SELECT split,
             COUNT(*) AS n_docs,
             COUNT(*) * 1.0 / SUM(COUNT(*)) OVER () AS frac,
             CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM s
      GROUP BY split
      ORDER BY split
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val h = substring(
      md5(concat(lit("split-"), col("doc_id").cast("string")).cast(BinaryType)), 1, 2)
    val split = when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    Tables.documents(s, d)
      .select(split.as("split"),
        size(graft.text.TextAnalysis.tokens(col("text"))).as("nt"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .select(
        col("split"), col("n_docs"),
        (col("n_docs") * lit(1.0)
          / sum(col("n_docs")).over(Window.partitionBy())).as("frac"),
        col("n_tokens"))
      .orderBy("split")
  }

  /** GROUPING SETS with explicit grain indicators — the general form behind
    * rollup/cube (both already covered): three chosen grains in ONE scan +
    * Expand, where naive SQL would union three aggregations (three scans).
    * Expressed through the SQL façade: the DataFrame API has no grouping-
    * sets verb, and the point of the façade is that SQL and DataFrame plans
    * are the same Catalyst plans.
    */
  val q_grouping_sets: Q = Q(
    "q_grouping_sets",
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus) AS g_status,
             GROUPING(o_orderpriority) AS g_priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY g_status, g_priority,
               o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """),
  ) { (s, d) =>
    Tables.registerViews(s, d)
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS INT) AS g_status,
             CAST(grouping(o_orderpriority) AS INT) AS g_priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY g_status, g_priority,
               o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """)
  }

  /** Fixed-bound equi-width histogram of order values: bucket arithmetic is
    * a scan-speed expression (no shuffle beyond the 10-row aggregation).
    * Fixed bounds rather than min/max so a single pass suffices; the
    * overflow bucket is clamped into the last bin, as profilers do.
    */
  val q_histogram: Q = Q(
    "q_histogram",
    Some("""
      SELECT bucket, bucket * 60000.0 AS lo, (bucket + 1) * 60000.0 AS hi, n, sum_price
      FROM (
        SELECT LEAST(CAST(floor(o_totalprice / 60000.0) AS BIGINT), 9) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY 1
      )
      ORDER BY bucket
    """),
  ) { (s, d) =>
    val bucket = least(floor(col("o_totalprice") / 60000.0).cast(LongType), lit(9L))
    Tables.orders(s, d)
      .groupBy(bucket.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"),
      )
      .select(
        col("bucket"),
        (col("bucket") * 60000.0).as("lo"),
        ((col("bucket") + 1) * 60000.0).as("hi"),
        col("n"), col("sum_price"),
      )
      .orderBy("bucket")
  }

  /** Time-series gap repair over the event stream: a generated hourly spine
    * (sequence over the observed min/max — the 1-row bounds aggregate
    * broadcasts) left-joined to the hourly rollup; missing hours get n = 0
    * and carry the last observed hourly average forward (ignore-nulls
    * last_value over a time order). The spine length is bounded by the time
    * range, not the data volume, so this shape survives any scale.
    */
  val q_ts_gapfill: Q = Q(
    "q_ts_gapfill",
    Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
      ), spine AS (
        SELECT unnest(generate_series((SELECT MIN(h) FROM hourly),
                                      (SELECT MAX(h) FROM hourly),
                                      INTERVAL 1 HOUR)) AS h
      )
      SELECT spine.h AS hour_start,
             COALESCE(hourly.n, 0) AS n,
             last_value(hourly.avg_value IGNORE NULLS)
               OVER (ORDER BY spine.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS avg_value_ff
      FROM spine LEFT JOIN hourly ON spine.h = hourly.h
      ORDER BY hour_start
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)))
          .as("avg_value"),
      )
    val bounds = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    spine.join(hourly, Seq("h"), "left")
      .select(
        col("h").as("hour_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("avg_value"), ignoreNulls = true)
          .over(Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("avg_value_ff"),
      )
      .orderBy("hour_start")
  }

  /** Time-series resampling with LINEAR INTERPOLATION — the gap repair a
    * metrics pipeline runs when zero-fill (q_ts_gapfill) would distort
    * rates: every (event_type, hour) grid cell missing an observation gets
    * the time-weighted blend of its nearest observed neighbors; leading/
    * trailing gaps take the nearest single neighbor. The window is
    * PARTITIONED by series key, so a million series parallelize and no
    * single-partition window ever forms (the q_skew_chunked_window hazard).
    * Hourly means come from decimal sums (order-independent, both engines);
    * the interpolation itself is the same double expression tree on both,
    * over whole-hour epoch deltas — bit-stable.
    */
  val q_ts_interpolate: Q = Q(
    "q_ts_interpolate",
    Some("""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        FROM events GROUP BY 1, 2
      ), bounds AS (
        SELECT MIN(date_trunc('hour', ts)) AS lo, MAX(date_trunc('hour', ts)) AS hi
        FROM events
      ), spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
      ), grid AS (
        SELECT event_type, h
        FROM (SELECT DISTINCT event_type FROM events), spine
      ), j AS (
        SELECT grid.event_type, grid.h, hourly.avg_value
        FROM grid LEFT JOIN hourly USING (event_type, h)
      ), w AS (
        SELECT event_type, h, avg_value,
               last_value(avg_value IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN avg_value IS NOT NULL THEN h END IGNORE NULLS)
                 OVER wp AS ph,
               first_value(avg_value IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN avg_value IS NOT NULL THEN h END IGNORE NULLS)
                 OVER wf AS nh
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      )
      SELECT event_type, h AS hour_start,
             avg_value IS NOT NULL AS observed,
             CASE WHEN avg_value IS NOT NULL THEN avg_value
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (epoch(h) - epoch(ph)) / (epoch(nh) - epoch(ph))
             END AS value_interp
      FROM w
      ORDER BY event_type, hour_start
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)))
        .as("avg_value"))
    val bounds = ev.agg(
      min(date_trunc("hour", col("ts"))).as("lo"),
      max(date_trunc("hour", col("ts"))).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    val grid = ev.select("event_type").distinct().crossJoin(spine)
    val wp = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val j = grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), col("avg_value"),
        last(col("avg_value"), ignoreNulls = true).over(wp).as("pv"),
        last(when(col("avg_value").isNotNull, col("h")), ignoreNulls = true)
          .over(wp).as("ph"),
        first(col("avg_value"), ignoreNulls = true).over(wf).as("nv"),
        first(when(col("avg_value").isNotNull, col("h")), ignoreNulls = true)
          .over(wf).as("nh"))
    j.select(
        col("event_type"), col("h").as("hour_start"),
        col("avg_value").isNotNull.as("observed"),
        when(col("avg_value").isNotNull, col("avg_value"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * (unix_timestamp(col("h")) - unix_timestamp(col("ph")))
            / (unix_timestamp(col("nh")) - unix_timestamp(col("ph"))))
          .as("value_interp"))
      .orderBy("event_type", "hour_start")
  }

  /** Multi-step conversion funnel: users whose first view precedes a click
    * which precedes a purchase (each step's anchor is the MIN timestamp at
    * or after the previous step's anchor). Three per-user aggregates chained
    * by equi-joins on user_id — each stage's frame shrinks, and every join
    * key is the natural shuffle key, so the funnel is three map-side-partial
    * aggregations + joins regardless of event volume.
    */
  val q_funnel: Q = Q(
    "q_funnel",
    Some("""
      WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
      ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t_view
        GROUP BY e.user_id
      ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY e.user_id
      )
      SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
             (SELECT COUNT(*) FROM c) AS n_click_users,
             (SELECT COUNT(*) FROM p) AS n_purchase_users
    """),
  ) { (s, d) =>
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = ev.join(v, "user_id")
      .filter(col("event_type") === "click" && col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = ev.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_view_users"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_users")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_users")))
  }

  /** Approximate quantiles — the sketch path q_quantiles documents as its
    * 100 TB swap, exposed as its own operator. Rows-only: DuckDB's
    * approx_quantile uses a different sketch, so cross-engine values
    * diverge by construction; the error bound vs exact is pinned in
    * AnalyticsSpec instead.
    */
  val q_approx_quantiles: Q = Q("q_approx_quantiles", None) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.50), lit(0.75), lit(0.95)), lit(10000)).as("ps"),
      )
      .select(
        col("l_returnflag"), col("n"),
        element_at(col("ps"), 1).as("p25"),
        element_at(col("ps"), 2).as("p50"),
        element_at(col("ps"), 3).as("p75"),
        element_at(col("ps"), 4).as("p95"),
      )
      .orderBy("l_returnflag")
  }

  /** Robust outlier audit — per-group median/MAD z-scores, the outlier
    * detector that survives the outliers it is hunting (mean/stddev get
    * dragged by the very tail they are meant to flag; the 50th percentile
    * does not). Two exact interpolated percentiles (median of the value,
    * then median of |value − median|) and a final pass counting rows beyond
    * the 3σ-equivalent robust threshold (3 × 1.4826 × MAD, written as the
    * single folded literal so neither engine's constant-fold order matters).
    *
    * Scale shape: three linear passes over the fact table, each a
    * partial-aggregated groupBy on the (low-cardinality) group key, with the
    * per-group medians broadcast back between passes — no pass ever holds
    * more than per-group sorted values, the same cost profile as
    * q_quantiles. The 100 TB swap is the same one q_quantiles documents:
    * replace `percentile` with `percentile_approx` (mergeable GK sketch)
    * when exactness is not required.
    */
  val q_outlier_mad: Q = Q(
    "q_outlier_mad",
    Some("""
      WITH med AS (
        SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
        FROM lineitem GROUP BY l_returnflag
      ), dev AS (
        SELECT l.l_returnflag, m.med,
               abs(l.l_extendedprice - m.med) AS absdev
        FROM lineitem l JOIN med m USING (l_returnflag)
      ), mad AS (
        SELECT l_returnflag, max(med) AS med,
               quantile_cont(absdev, 0.5) AS mad
        FROM dev GROUP BY l_returnflag
      )
      SELECT d.l_returnflag,
             COUNT(*) AS n,
             max(m.med) AS med,
             max(m.mad) AS mad,
             COUNT(*) FILTER (WHERE d.absdev > 4.4478 * m.mad) AS n_outliers
      FROM dev d JOIN mad m USING (l_returnflag)
      GROUP BY d.l_returnflag
      ORDER BY d.l_returnflag
    """),
  ) { (s, d) =>
    // balanced when the scan is narrower than the core count (r17): all
    // three passes run their compute-dense partial aggregation (percentile
    // state, counts) at core parallelism instead of one task per file
    val li = graft.util.Balance.ifNarrow(
      Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice"),
      col("l_extendedprice"))
    val med = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("med"))
    val dev = li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("absdev", abs(col("l_extendedprice") - col("med")))
    val mad = dev.groupBy("l_returnflag")
      .agg(max("med").as("med"), percentile(col("absdev"), lit(0.5)).as("mad"))
    dev.select("l_returnflag", "absdev")
      .join(broadcast(mad), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        max("med").as("med"),
        max("mad").as("mad"),
        count(when(col("absdev") > lit(4.4478) * col("mad"), 1)).as("n_outliers"),
      )
      // lazy checkpoint before the presentation sort (r17): without it the
      // range exchange's sampling re-executed the third full pass over the
      // fact table (scan + broadcast joins + count agg) just to learn the
      // bounds of a groups-bounded output — same rationale as q_quantiles
      .localCheckpoint(eager = false)
      .orderBy("l_returnflag")
  }

  /** Equi-depth histogram — the quantile-bucketed companion to the
    * equi-width q_histogram: bucket EDGES adapt to the distribution so every
    * bucket holds ~1/8 of the rows (the binning that stays readable on
    * skewed data, and the one query optimizers keep as column statistics).
    * Scale-correct form: a global `ntile` would drag the whole table through
    * ONE window partition; instead the 7 interior cut points come from the
    * exact distributed percentile aggregate (one tiny row), broadcast back,
    * and each row counts the cuts below it with an in-row array filter —
    * scan-speed assignment, one shuffle total for the final 8-row groupBy.
    * Ties sit wholly in one bucket (documented equi-depth-by-value, exact
    * mirror on both engines); the 100 TB swap is `percentile_approx` cuts.
    */
  val q_histogram_equidepth: Q = Q(
    "q_histogram_equidepth",
    Some("""
      WITH cuts AS (
        SELECT [quantile_cont(o_totalprice, 0.125), quantile_cont(o_totalprice, 0.25),
                quantile_cont(o_totalprice, 0.375), quantile_cont(o_totalprice, 0.5),
                quantile_cont(o_totalprice, 0.625), quantile_cont(o_totalprice, 0.75),
                quantile_cont(o_totalprice, 0.875)] AS cs
        FROM orders
      ), b AS (
        SELECT o_totalprice,
               1 + len(list_filter(cs, c -> o_totalprice > c)) AS bucket
        FROM orders CROSS JOIN cuts
      )
      SELECT bucket, COUNT(*) AS n,
             MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM b GROUP BY bucket ORDER BY bucket
    """),
  ) { (s, d) =>
    // NOT balanced (r17, measured): the bucket pass is a few cheap array
    // probes per row, and balancing both passes' scans cost more in
    // exchanges than the parallelism returned (1.0 s -> 1.6 s warm)
    val o = Tables.orders(s, d).select("o_totalprice")
    val cuts = o.agg(percentile(col("o_totalprice"),
      array(lit(0.125), lit(0.25), lit(0.375), lit(0.5),
        lit(0.625), lit(0.75), lit(0.875))).as("cs"))
    o.crossJoin(broadcast(cuts))
      .select(col("o_totalprice"),
        (lit(1) + size(filter(col("cs"), c => col("o_totalprice") > c)))
          .cast(LongType).as("bucket"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_price"),
      )
      .orderBy("bucket")
  }

  /** Per-group sampling cap — the "at most N documents per source" rule
    * every training-data mixture applies. Selection order inside a group is
    * the md5 of the key (a deterministic shuffle, not arrival order, so the
    * kept subset is unbiased and reproducible); the cap is a row_number
    * window per group — one shuffle on the group key, k-bounded output per
    * group. Emits the per-language kept counts plus how many were dropped.
    */
  val q_sample_capped: Q = Q(
    "q_sample_capped",
    Some("""
      WITH r AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
      )
      SELECT lang,
             COUNT(*) FILTER (WHERE rn <= 100) AS n_kept,
             COUNT(*) FILTER (WHERE rn > 100) AS n_dropped
      FROM r
      GROUP BY lang
      ORDER BY lang
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast(StringType).cast(BinaryType)), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), row_number().over(w).as("rn"))
      .groupBy("lang")
      .agg(
        count(when(col("rn") <= 100, 1)).as("n_kept"),
        count(when(col("rn") > 100, 1)).as("n_dropped"),
      )
      .orderBy("lang")
  }

  /** Weighted (score-proportional) hash sampling — the mixture primitive:
    * P(keep) = quality weight, realized deterministically by comparing a
    * 16-bit hash of the key against weight·65536. Same reproducibility
    * story as q_sample_hash; the weight here is the type-token ratio (an
    * int/int double division, identical on both engines). DuckDB has no
    * hex→int cast, so the oracle parses the 4 hex digits with strpos
    * arithmetic. Output audits kept counts and mean weight per language —
    * at corpus scale the realized rate converges to the mean weight.
    */
  val q_sample_weighted: Q = Q(
    "q_sample_weighted",
    Some("""
      WITH w AS (
        SELECT doc_id, lang,
               len(list_distinct(string_split_regex(text, '\s+'))) * 1.0
                 / len(string_split_regex(text, '\s+')) AS weight,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
      ), k AS (
        SELECT lang, weight,
               (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096
                 + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 256
                 + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) AS h16
        FROM w
      )
      SELECT lang, COUNT(*) AS n,
             COUNT(*) FILTER (WHERE h16 < weight * 65536.0) AS n_kept,
             CAST(SUM(CAST(weight AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS mean_weight
      FROM k
      GROUP BY lang
      ORDER BY lang
    """),
  ) { (s, d) =>
    val toks = split(col("text"), graft.text.TextAnalysis.wsRe)
    val weight = size(array_distinct(toks)) * lit(1.0) / size(toks)
    val h16 = conv(substring(md5(col("doc_id").cast(StringType).cast(BinaryType)), 1, 4),
      16, 10).cast(DoubleType)
    Tables.documents(s, d)
      .select(col("lang"), weight.as("weight"), h16.as("h16"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("h16") < col("weight") * 65536.0, 1)).as("n_kept"),
        // double sums merge in partition order (nondeterministic ulps);
        // exact DECIMAL internally, DOUBLE out — the engine-wide rule
        (sum(col("weight").cast(DecimalType(18, 12))).cast(DoubleType) / count(lit(1)))
          .as("mean_weight"),
      )
      .orderBy("lang")
  }

  /** Cohort retention triangle: users grouped by first-seen week, counted
    * distinct in each subsequent week. Two aggregations over the event
    * stream (first-seen per user, then distinct users per cohort × offset
    * cell) — both shuffle on user-ish keys, and the output is bounded by
    * weeks², not data volume. Week offsets divide exactly (both operands
    * are week-start timestamps), so the arithmetic is integer-clean on
    * both engines.
    */
  val q_retention_cohorts: Q = Q(
    "q_retention_cohorts",
    Some("""
      WITH first_seen AS (
        -- DuckDB's week-trunc yields DATE; Spark's yields TIMESTAMP — cast
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
      ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS active_week
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
      )
      SELECT cohort_week,
             CAST((epoch(active_week) - epoch(cohort_week)) / 604800 AS BIGINT)
               AS weeks_since,
             COUNT(*) AS n_active
      FROM activity
      GROUP BY cohort_week, active_week
      ORDER BY cohort_week, weeks_since
    """),
  ) { (s, d) =>
    val events = Tables.events(s, d)
    val firstSeen = events.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val activity = events.select("user_id", "ts")
      .join(firstSeen, "user_id")
      .select(col("user_id"), col("cohort_week"),
        date_trunc("week", col("ts")).as("active_week"))
      .distinct()
    activity
      .groupBy("cohort_week", "active_week")
      .agg(count(lit(1)).as("n_active"))
      .select(
        col("cohort_week"),
        // integer floor division on epoch seconds: double division + a
        // truncating cast agreed with DuckDB's rounding cast only because
        // UTC week-truncated stamps differ by exact 604800 multiples; DIV
        // keeps the result rounding-mode independent in any timezone/DST
        // configuration
        expr("(CAST(active_week AS BIGINT) - CAST(cohort_week AS BIGINT)) DIV 604800")
          .as("weeks_since"),
        col("n_active"),
      )
      .orderBy("cohort_week", "weeks_since")
  }

  /** One-pass column profiler — the dataset summary a pipeline runs before
    * trusting a new drop: per numeric column, null count, exact distinct
    * count, and min/max. ONE scan computes all sixteen aggregates (the
    * multiple exact DISTINCTs plan as a single Expand, not four scans);
    * the per-column result rows are then unpacked from the 1-row aggregate
    * with an explode, so the operator never rescans the table per column.
    * At 100 TB the exact distincts are the expensive term — the documented
    * swap is approx_count_distinct (q_approx_distinct pins its error).
    */
  val q_profile_columns: Q = Q(
    "q_profile_columns",
    Some("""
      WITH a AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(*) - COUNT(l_quantity)      AS nn_q,
               COUNT(DISTINCT l_quantity)        AS nd_q,
               CAST(MIN(l_quantity) AS DOUBLE)   AS mn_q,
               CAST(MAX(l_quantity) AS DOUBLE)   AS mx_q,
               COUNT(*) - COUNT(l_extendedprice) AS nn_e,
               COUNT(DISTINCT l_extendedprice)   AS nd_e,
               CAST(MIN(l_extendedprice) AS DOUBLE) AS mn_e,
               CAST(MAX(l_extendedprice) AS DOUBLE) AS mx_e,
               COUNT(*) - COUNT(l_discount)      AS nn_d,
               COUNT(DISTINCT l_discount)        AS nd_d,
               CAST(MIN(l_discount) AS DOUBLE)   AS mn_d,
               CAST(MAX(l_discount) AS DOUBLE)   AS mx_d,
               COUNT(*) - COUNT(l_tax)           AS nn_t,
               COUNT(DISTINCT l_tax)             AS nd_t,
               CAST(MIN(l_tax) AS DOUBLE)        AS mn_t,
               CAST(MAX(l_tax) AS DOUBLE)        AS mx_t
        FROM lineitem
      )
      SELECT col_name, n_rows, n_nulls, n_distinct, min_value, max_value
      FROM (
        SELECT 'l_quantity' AS col_name, n_rows, nn_q AS n_nulls,
               nd_q AS n_distinct, mn_q AS min_value, mx_q AS max_value FROM a
        UNION ALL
        SELECT 'l_extendedprice', n_rows, nn_e, nd_e, mn_e, mx_e FROM a
        UNION ALL
        SELECT 'l_discount', n_rows, nn_d, nd_d, mn_d, mx_d FROM a
        UNION ALL
        SELECT 'l_tax', n_rows, nn_t, nd_t, mn_t, mx_t FROM a
      )
      ORDER BY col_name
    """),
  ) { (s, d) =>
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      (count(lit(1)) - count(col(c))).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast(DoubleType).as(s"mn_$c"),
      max(col(c)).cast(DoubleType).as(s"mx_$c")))
    // NOT balanced (r17, measured): the multi-distinct Expand's cost sits
    // in the post-exchange distinct-merge stages (already 32-way), so a
    // balancing shuffle of the raw rows only added an exchange (2.33 s ->
    // 2.50 s warm) — the opposite of the q_cube result, where the map-side
    // Expand dominates
    Tables.lineitem(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"nn_$c").as("n_nulls"),
          col(s"nd_$c").as("n_distinct"), col(s"mn_$c").as("min_value"),
          col(s"mx_$c").as("max_value"))): _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
      .orderBy("col_name")
  }

  /** Grouped second-moment statistics — variance, stddev, covariance,
    * correlation — computed from EXACT decimal power sums rather than the
    * built-in float aggregates. Why: `var_samp`/`corr` accumulate doubles
    * in partition order, so Spark (partial aggregation across partitions)
    * and DuckDB (single-threaded segment sums) round differently and the
    * driver's hash compare would flake. Decimal sums of short-decimal
    * inputs (integer quantities, 2-decimal prices) are order-independent
    * and bit-identical on both engines; the closed-form moments then
    * evaluate in doubles over identical inputs. Same one-shuffle partial-
    * aggregate shape as any groupBy — the decimal accumulators cost a few
    * extra bytes per group, not a different plan. (On data without short
    * decimal reps, scale the fixed-point quantum instead — SURVEY §8
    * round-6 float rules.)
    */
  val q_stats_moments: Q = Q(
    "q_stats_moments",
    Some("""
      WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(20,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_quantity AS DECIMAL(20,2))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2))) AS syy,
               SUM(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2))) AS sxy
        FROM lineitem GROUP BY l_returnflag
      )
      SELECT l_returnflag, n,
             CAST(sx AS DOUBLE) / n AS mean_qty,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
               / (n - 1) AS var_qty,
             sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / (n - 1)) AS stddev_price,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               / (n - 1) AS covar_qty_price,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS corr_qty_price
      FROM s
      ORDER BY l_returnflag
    """),
  ) { (s, d) =>
    val x = col("l_quantity").cast(DecimalType(20, 2))
    val y = col("l_extendedprice").cast(DecimalType(20, 2))
    def dbl(c: String) = col(c).cast(DoubleType)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        (dbl("sx") / col("n")).as("mean_qty"),
        ((dbl("sxx") - dbl("sx") * dbl("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
        sqrt((dbl("syy") - dbl("sy") * dbl("sy") / col("n")) / (col("n") - 1))
          .as("stddev_price"),
        ((dbl("sxy") - dbl("sx") * dbl("sy") / col("n")) / (col("n") - 1))
          .as("covar_qty_price"),
        ((dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy"))
          / sqrt((dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
            * (dbl("n") * dbl("syy") - dbl("sy") * dbl("sy"))))
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Distribution-drift detection between two time halves of the event
    * stream — the Population Stability Index every production pipeline
    * monitors before retraining (PSI = Σ (p_late − p_early)·ln(p_late /
    * p_early) over value buckets; > 0.1 flags drift): a crawl snapshot or
    * feature feed whose value distribution shifts should fail loudly
    * before it trains a model. Fixed-width buckets (floor(value/50), top
    * bucket open) + Laplace-smoothed integer-count ratios, so every input
    * to ln is an exact int/int double on both engines; the 10-term PSI
    * sum goes through DECIMAL(20,12) — the same order-independent decimal
    * accumulation the moments/bigram-LM queries pin — because a plain
    * double sum would differ in the last ulp by partition order. Buckets
    * absent from BOTH halves contribute nothing on either engine (the
    * count frame only materializes observed buckets). Scale shape: one
    * scan, one (type, bucket) groupBy, a type-count-sized broadcast back
    * — two linear passes at any scale.
    */
  /** (event_type, bucket, c) histogram counts — the 50-wide, capped-at-9
    * binning every PSI computation shares.
    */
  def bucketCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      least(floor(col("value") / 50.0), lit(9L)).cast(IntegerType).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))

  /** PSI of `cur` histogram counts against `ref` counts — the two-frame
    * form of [[q_drift_psi]]'s one-pass computation, shared with the
    * streaming per-batch twin (Streaming.psiDriftPerBatch). The bucket
    * support is the full-outer union of both frames (exactly the support
    * the one-pass two-filter groupBy produces — a group exists iff either
    * side saw it; StreamingSpec pins the equality), smoothing and the
    * DECIMAL(20,12) ln-term sums are identical. Both count frames are
    * type-count × ≤10-bucket tiny at any corpus scale — the heavy scan
    * happened in [[bucketCounts]]'s partial-aggregated groupBy.
    * Output: (event_type, n_ref, n_cur, psi, drifted).
    */
  def psiFromCounts(ref: DataFrame, cur: DataFrame): DataFrame = {
    val c = ref.select(col("event_type"), col("bucket"), col("c").as("c_e"))
      .join(cur.select(col("event_type"), col("bucket"), col("c").as("c_l")),
        Seq("event_type", "bucket"), "full_outer")
      .na.fill(0L, Seq("c_e", "c_l"))
    val n = c.groupBy("event_type").agg(
      sum(col("c_e")).as("n_e"), sum(col("c_l")).as("n_l"))
    val p = c.join(broadcast(n), "event_type")
      .withColumn("p_e", (col("c_e") + 1) * lit(1.0) / (col("n_e") + 10))
      .withColumn("p_l", (col("c_l") + 1) * lit(1.0) / (col("n_l") + 10))
    val term = (col("p_l") - col("p_e")) * log(col("p_l") / col("p_e"))
    p.groupBy("event_type")
      .agg(
        min(col("n_e")).as("n_ref"),
        min(col("n_l")).as("n_cur"),
        sum(term.cast(DecimalType(20, 12))).cast(DoubleType).as("psi"))
      .withColumn("drifted", col("psi") > 0.1)
  }

  val q_drift_psi: Q = Q(
    "q_drift_psi",
    Some("""
      WITH e AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS half,
               CAST(least(floor(value / 50.0), 9) AS INT) AS bucket
        FROM events
      ), c AS (
        SELECT event_type, bucket,
               COUNT(*) FILTER (WHERE half = 0) AS c_e,
               COUNT(*) FILTER (WHERE half = 1) AS c_l
        FROM e GROUP BY event_type, bucket
      ), n AS (
        SELECT event_type, CAST(SUM(c_e) AS BIGINT) AS n_e,
               CAST(SUM(c_l) AS BIGINT) AS n_l
        FROM c GROUP BY event_type
      ), p AS (
        SELECT c.event_type, c.bucket, n.n_e, n.n_l,
               (c.c_e + 1) * 1.0 / (n.n_e + 10) AS p_e,
               (c.c_l + 1) * 1.0 / (n.n_l + 10) AS p_l
        FROM c JOIN n ON c.event_type = n.event_type
      )
      SELECT event_type,
             CAST(min(n_e) AS BIGINT) AS n_early,
             CAST(min(n_l) AS BIGINT) AS n_late,
             CAST(SUM(CAST((p_l - p_e) * ln(p_l / p_e) AS DECIMAL(20,12)))
               AS DOUBLE) AS psi,
             CAST(SUM(CAST((p_l - p_e) * ln(p_l / p_e) AS DECIMAL(20,12)))
               AS DOUBLE) > 0.1 AS drifted
      FROM p GROUP BY event_type ORDER BY event_type
    """),
  ) { (s, d) =>
    val e = Tables.events(s, d).select(
      col("event_type"),
      // ts is TIMESTAMP_NTZ (Tables.events): the boundary literal must be
      // NTZ too — a to_timestamp literal would re-introduce a session-
      // timezone dependence the naive oracle compare doesn't have
      when(col("ts") < lit(java.time.LocalDateTime.parse("2024-01-16T00:00")), 0)
        .otherwise(1).as("half"),
      least(floor(col("value") / 50.0), lit(9L)).cast(IntegerType).as("bucket"))
    val c = e.groupBy("event_type", "bucket").agg(
      count(when(col("half") === 0, 1)).as("c_e"),
      count(when(col("half") === 1, 1)).as("c_l"))
    val n = c.groupBy("event_type").agg(
      sum(col("c_e")).as("n_e"), sum(col("c_l")).as("n_l"))
    val p = c.join(broadcast(n), "event_type")
      .withColumn("p_e", (col("c_e") + 1) * lit(1.0) / (col("n_e") + 10))
      .withColumn("p_l", (col("c_l") + 1) * lit(1.0) / (col("n_l") + 10))
    val term = (col("p_l") - col("p_e")) * log(col("p_l") / col("p_e"))
    p.groupBy("event_type")
      .agg(
        min(col("n_e")).as("n_early"),
        min(col("n_l")).as("n_late"),
        sum(term.cast(DecimalType(20, 12))).cast(DoubleType).as("psi"))
      .withColumn("drifted", col("psi") > 0.1)
      .orderBy("event_type")
  }

  /** One incremental-ledger fixture per (session, sfDir): a SnapshotTable
    * of the documents facts, its [[graft.io.IncrementalView]] ledger, then
    * two deterministic commits (update docs with doc_id % 7 = 2 by +1000
    * chars; tombstone docs with doc_id % 11 = 3) absorbed by ONE refresh
    * from the change feed. Memoized like SparkEntry.fixture so bench
    * re-runs time the refreshed view's read, not table construction.
    */
  private val mvCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), String]()

  private def mvFixture(s: org.apache.spark.sql.SparkSession, d: String): String =
    mvCache.computeIfAbsent((s, d), { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
      val base = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      graft.io.SnapshotTable.create(base, s"$dir/src")
      graft.io.IncrementalView.create(s, s"$dir/src", s"$dir/view",
        Seq("source"), Seq("n_chars"))
      // extrema twin over the same source: min/max ride the non-additive
      // maintenance path (insert tightening + tie-triggered recompute)
      graft.io.IncrementalView.create(s, s"$dir/src", s"$dir/view_ext",
        Seq("source"), Nil, minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
      // exact COUNT(DISTINCT) twin: the two-level additive composition
      graft.io.IncrementalView.createDistinct(s, s"$dir/src", s"$dir/view_dc",
        Seq("source"), "n_chars")
      graft.io.SnapshotTable.merge(s, s"$dir/src",
        base.filter(pmod(col("doc_id"), lit(7)) === 2)
          .withColumn("n_chars", col("n_chars") + 1000),
        "doc_id")
      graft.io.SnapshotTable.merge(s, s"$dir/src",
        base.filter(pmod(col("doc_id"), lit(11)) === 3)
          .withColumn("gone", lit(true)),
        "doc_id", deleteCol = Some("gone"))
      graft.io.IncrementalView.refresh(s, s"$dir/src", s"$dir/view",
        Seq("source"), Seq("n_chars"))
      graft.io.IncrementalView.refresh(s, s"$dir/src", s"$dir/view_ext",
        Seq("source"), Nil, minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
      graft.io.IncrementalView.refreshDistinct(s, s"$dir/src", s"$dir/view_dc",
        Seq("source"), "n_chars")
      dir
    })

  /** Incremental materialized ledger, oracle-checked end state: the view
    * maintained PURELY from the change feed (two commits, one refresh —
    * update + delete paths both exercised) must equal DuckDB's recompute
    * of the post-commit table. A wrong file diff, sign, tombstone, or
    * idempotence bug hash-mismatches.
    */
  val q_mv_ledger: Q = Q(
    "q_mv_ledger",
    Some("""
      WITH eff AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 2 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        FROM documents
        WHERE doc_id % 11 <> 3
      )
      SELECT source, count(*) AS mv_count, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM eff GROUP BY source ORDER BY source
    """),
  ) { (s, d) =>
    graft.io.SnapshotTable.read(s, s"${mvFixture(s, d)}/view")
      .select(col("source"), col(graft.io.IncrementalView.countCol).as("mv_count"),
        col("n_chars").as("sum_chars"))
      .orderBy("source")
  }

  /** Non-additive incremental maintenance, oracle-checked end state: the
    * min/max view refreshed from the change feed (the update commit
    * re-emits group-extremum rows as delete+insert, forcing the
    * tie-triggered per-key recompute; the delete commit removes rows
    * outright) must equal DuckDB's direct recompute of the post-commit
    * table. A wrong tie test, a missed recompute key, or an insert-side
    * `least`/`greatest` slip hash-mismatches.
    */
  val q_mv_extrema: Q = Q(
    "q_mv_extrema",
    Some("""
      WITH eff AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 2 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        FROM documents
        WHERE doc_id % 11 <> 3
      )
      SELECT source, min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM eff GROUP BY source ORDER BY source
    """),
  ) { (s, d) =>
    graft.io.SnapshotTable.read(s, s"${mvFixture(s, d)}/view_ext")
      .select(col("source"),
        col(graft.io.IncrementalView.minName("n_chars")).as("min_chars"),
        col(graft.io.IncrementalView.maxName("n_chars")).as("max_chars"))
      .orderBy("source")
  }

  /** Incremental exact COUNT(DISTINCT), oracle-checked end state: the
    * two-level additive composition ([[graft.io.IncrementalView
    * .createDistinct]]) refreshed through the same update+delete commits
    * must equal DuckDB's COUNT(DISTINCT) recompute. A multiplicity that
    * fails to tombstone at zero, a level-2 feed that double-counts a
    * rewrite, or a null value leaking into the distinct set all
    * hash-mismatch.
    */
  val q_mv_distinct: Q = Q(
    "q_mv_distinct",
    Some("""
      WITH eff AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 2 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        FROM documents
        WHERE doc_id % 11 <> 3
      )
      SELECT source, count(DISTINCT n_chars) AS distinct_chars
      FROM eff GROUP BY source ORDER BY source
    """),
  ) { (s, d) =>
    graft.io.IncrementalView.readDistinct(s, s"${mvFixture(s, d)}/view_dc")
      .select(col("source"),
        col(graft.io.IncrementalView.countCol).as("distinct_chars"))
      .orderBy("source")
  }

  /** One incremental JOIN-view fixture per (session, sfDir): a lineitem
    * fact SnapshotTable keyed on lk = l_orderkey·10 + l_linenumber (a
    * single MERGE key; l_linenumber < 10), a revenue-by-nation view whose
    * keys and measures only exist THROUGH the enrich joins
    * (fact ⋈ supplier ⋈ nation, revenue = price·(1−discount) in exact
    * DECIMAL), then the same update/delete commit pair as [[mvFixture]]
    * absorbed by one enriched refresh. The dims are broadcast inside
    * enrich, so a refresh costs one delta scan + two broadcast joins —
    * never a fact rescan: the star-schema maintenance loop at 100 TB.
    */
  private val mvJoinCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), String]()

  private def mvJoinFixture(s: org.apache.spark.sql.SparkSession, d: String): String =
    mvJoinCache.computeIfAbsent((s, d), { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mvj").toString
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, and
      // MERGE requires a unique source key — collapse each lk to its
      // lexicographic-max row (max over a struct; full-duplicate ties are
      // value-identical, so the pick is deterministic and SQL-mirrorable)
      val base = Tables.lineitem(s, d).select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("lk"),
        col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .groupBy("lk")
        .agg(max(struct(col("l_suppkey"), col("l_extendedprice"),
          col("l_discount"))).as("m"))
        .select(col("lk"), col("m.l_suppkey").as("l_suppkey"),
          col("m.l_extendedprice").as("l_extendedprice"),
          col("m.l_discount").as("l_discount"))
      graft.io.SnapshotTable.create(
        base.repartition(8, col("lk")), s"$dir/src")
      val dim = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(Tables.nation(s, d).select("n_nationkey", "n_name"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val enrich: DataFrame => DataFrame = { df =>
        df.join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
          .withColumn("revenue",
            col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
      }
      // dims stamped so refresh enforces the static-dims contract
      graft.io.IncrementalView.create(s, s"$dir/src", s"$dir/view",
        Seq("n_name"), Seq("revenue"), enrich = enrich, dims = Seq(dim))
      graft.io.SnapshotTable.merge(s, s"$dir/src",
        base.filter(pmod(col("lk"), lit(7)) === 2)
          .withColumn("l_extendedprice", col("l_extendedprice") + 100),
        "lk")
      graft.io.SnapshotTable.merge(s, s"$dir/src",
        base.filter(pmod(col("lk"), lit(11)) === 3)
          .withColumn("gone", lit(true)),
        "lk", deleteCol = Some("gone"))
      graft.io.IncrementalView.refresh(s, s"$dir/src", s"$dir/view",
        Seq("n_name"), Seq("revenue"), enrich = enrich, dims = Seq(dim))
      dir
    })

  /** Incremental JOIN view (star aggregate maintained from the fact feed),
    * oracle-checked end state: the enriched view after update + delete
    * commits and one refresh must equal DuckDB's full fact⋈dims recompute.
    * A feed row that misses its dim match, a sign applied before the
    * derive, or an enrich skipped on any of the three read paths
    * hash-mismatches.
    */
  val q_mv_join: Q = Q(
    "q_mv_join",
    Some("""
      WITH lk0 AS (
        SELECT l_orderkey * 10 + l_linenumber AS lk,
               l_suppkey, l_extendedprice, l_discount
        FROM lineitem
      ), lk AS (
        SELECT lk, l_suppkey, l_extendedprice, l_discount
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lk
                ORDER BY l_suppkey DESC, l_extendedprice DESC,
                         l_discount DESC) AS rn
              FROM lk0)
        WHERE rn = 1
      ), eff AS (
        SELECT l_suppkey,
               CAST(CASE WHEN lk % 7 = 2 THEN l_extendedprice + 100
                         ELSE l_extendedprice END AS DECIMAL(18,2)) AS price,
               CAST(l_discount AS DECIMAL(18,2)) AS disc
        FROM lk WHERE lk % 11 <> 3
      )
      SELECT n_name, count(*) AS mv_count,
             CAST(SUM(price * (1 - disc)) AS DOUBLE) AS revenue
      FROM eff
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      GROUP BY n_name ORDER BY n_name
    """),
  ) { (s, d) =>
    graft.io.SnapshotTable.read(s, s"${mvJoinFixture(s, d)}/view")
      .select(col("n_name"),
        col(graft.io.IncrementalView.countCol).as("mv_count"),
        col("revenue").cast(DoubleType).as("revenue"))
      .orderBy("n_name")
  }

  /** One z-ordered events snapshot per (session, sfDir): hash-scattered
    * ingest into 8 files (zone maps present, useless), then one z-order
    * compaction over (user_id, value) into 16 z-tiles. Memoized so bench
    * re-runs time the pruned box read, not table construction.
    */
  private val zCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), String]()

  private def zFixture(s: org.apache.spark.sql.SparkSession, d: String): String =
    zCache.computeIfAbsent((s, d), { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-z").toString + "/events_z"
      val base = Tables.events(s, d)
        .select("event_id", "user_id", "event_type", "value")
        .repartition(8, col("event_id"))
      graft.io.SnapshotTable.create(base, dir, statsCols = Seq("user_id", "value"))
      graft.io.SnapshotTable.compact(s, dir, minFileBytes = 1L << 30,
        targetPartitions = 16, zOrderBy = Seq("user_id", "value"))
      dir
    })

  /** Z-ordered layout serving read, oracle-checked: a 2-D box predicate
    * answered through [[graft.io.SnapshotTable.readBox]] over the z-tiled
    * snapshot must equal DuckDB's plain filter over the raw table — the
    * manifest-level pruning is an optimization the hash must not see.
    * IoSpec pins the pruning itself (≤ 4 of 16 files for the box).
    */
  val q_io_zorder: Q = Q(
    "q_io_zorder",
    Some("""
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      WHERE user_id BETWEEN 0 AND 9 AND value BETWEEN 0 AND 80
      GROUP BY event_type ORDER BY event_type
    """),
  ) { (s, d) =>
    graft.io.SnapshotTable.readBox(s, zFixture(s, d),
      Seq(("user_id", 0.0, 9.0), ("value", 0.0, 80.0)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy("event_type")
  }

  def all: Seq[Q] = Seq(
    q_quantiles, q_sample_hash, q_grouping_sets, q_histogram, q_ts_gapfill,
    q_funnel, q_approx_quantiles, q_sample_capped, q_sample_weighted,
    q_retention_cohorts, q_profile_columns, q_stats_moments, q_ts_interpolate,
    q_sample_split, q_outlier_mad, q_histogram_equidepth, q_drift_psi,
    q_mv_ledger, q_mv_extrema, q_mv_distinct, q_mv_join, q_io_zorder)
}
