package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.{Q, Tables}

/** Window-function operators (SURVEY.md §2.6): the reference's group-scoped
  * running max (P3/W1, transform_raw_data.py:114-116) and order-sensitive
  * keep-first dedup (D1, transform_raw_data.py:182-189), generalized to the
  * synthetic tables, plus as-of join and sessionization.
  *
  * Every window carries a TOTAL order ((l_shipdate, l_orderkey,
  * l_linenumber) / (ts, event_id)) so results are deterministic under any
  * partitioning — the reference gets this implicitly from file order; a
  * distributed engine must pin it explicitly (SURVEY §7.1).
  */
object Windows {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.TimestampType

  /** Epoch millis of an NTZ timestamp read as UTC wall time (session TZ is
    * UTC, so the LTZ cast is exact) — mirrors DuckDB's epoch_ms(naive ts).
    */
  private def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))

  /** W1/P3 running max per group. One shuffle on the partition key; the sort
    * within partitions is spill-safe (sort-based window exec).
    */
  val q_w1_running_max: Q = Q(
    "q_w1_running_max",
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
             MAX(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max_qty
      FROM lineitem
      ORDER BY l_suppkey, l_orderkey, l_linenumber
    """),
  ) { (s, d) =>
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        max(col("l_quantity")).over(w).as("run_max_qty"),
      )
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** D1 keep-first dedup: first lineitem per part in (shipdate, orderkey,
    * linenumber) order. row_number + filter — deterministic survivor, unlike
    * dropDuplicates (SURVEY §2.5).
    */
  val q_d1_dedup_first: Q = Q(
    "q_d1_dedup_first",
    Some("""
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate
      FROM (
        SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
               ROW_NUMBER() OVER (
                 PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        FROM lineitem)
      WHERE rn = 1
      ORDER BY l_partkey
    """),
  ) { (s, d) =>
    val w = Window
      .partitionBy("l_partkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy("l_partkey")
  }

  /** As-of join: each purchase matched to the user's most recent strictly
    * preceding click. Implemented as a single-pass tagged-union window (one
    * shuffle on user_id) instead of a self-join — at 100 TB a ts-range
    * self-join explodes; the union+last(ignoreNulls) form stays linear.
    */
  val q_asof_click_purchase: Q = Q(
    "q_asof_click_purchase",
    Some("""
      WITH ce AS (
        SELECT * FROM events WHERE event_type IN ('click', 'purchase')
      ), w AS (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
        FROM ce)
      SELECT event_id, user_id, ts, click_id,
             epoch_ms(ts) - epoch_ms(click_ts) AS ms_since_click
      FROM w
      WHERE event_type = 'purchase'
      ORDER BY event_id
    """),
  ) { (s, d) =>
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true)
          .over(w).as("click_id"),
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w).as("click_ts"),
      )
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("ts"), col("click_id"),
        (epochMs(col("ts")) - epochMs(col("click_ts"))).as("ms_since_click"),
      )
      .orderBy("event_id")
  }

  /** Sessionization (gaps-and-islands): 30-minute inactivity gap splits a
    * user's events into sessions. lag → gap flag → running sum = session id;
    * two window passes over one user_id shuffle. Streaming equivalent =
    * session_window (graft.streaming).
    */
  val q_sessionize: Q = Q(
    "q_sessionize",
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_ms(ts) - epoch_ms(
                      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                    > 1800000 THEN 1
                    WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                    ELSE 0 END AS new_session
        FROM events
      ), sess AS (
        SELECT user_id, ts, event_id, value,
               CAST(SUM(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id,
             COUNT(*) AS n_events,
             MIN(ts) AS session_start,
             MAX(ts) AS session_end,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run   = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(order))
      .withColumn(
        "new_session",
        when(epochMs(col("ts")) - epochMs(col("prev_ts")) > 1800000L, 1L)
          .when(col("prev_ts").isNull, 1L)
          .otherwise(0L),
      )
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("session_value"),
      )
      .orderBy("user_id", "session_id")
  }

  /** Time-based trailing window: per user, the count and value-sum of the
    * trailing hour, as a RANGE frame over epoch seconds. This is the frame
    * kind q_window_suite's ROWS frames cannot express — RANGE bounds select
    * by ORDER-value distance, so equal timestamps share a frame and sparse
    * gaps shrink it. Plan: one shuffle on user_id, sort, single windowed
    * pass — the same shape at any scale (plus date-bucketed pre-partitioning
    * when one user's history outgrows a task, cf. q_skew_chunked_window).
    * The windowed sum runs in DECIMAL: window evaluation order is
    * deterministic, but DuckDB computes sliding aggregates with a segment
    * tree whose float addition ORDER differs from Spark's running
    * accumulator — exact DECIMAL makes both orders the same number.
    * The oracle buckets with floor(epoch(ts)): Spark's timestamp→long cast
    * TRUNCATES sub-second precision while DuckDB's double→bigint cast
    * ROUNDS, so a fractional-second timestamp ≥ .5 would land in different
    * RANGE frames — explicit floor pins identical bucketing at any input
    * precision (the driver data is whole seconds; this keeps it an
    * invariant rather than a coincidence).
    */
  val q_window_trailing: Q = Q(
    "q_window_trailing",
    Some("""
      SELECT event_id, user_id, ts,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts, event_id
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val w = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"))
      .rangeBetween(-3599L, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("ts").cast("timestamp").cast(LongType).as("epoch_s"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast(DoubleType)
          .as("sum_1h"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Last-touch attribution — the marketing-analytics read every event
    * pipeline serves: each purchase is credited to the user's most recent
    * STRICTLY-PRIOR touch event (click or view); purchases with no prior
    * touch fall into the 'direct' bucket. One ignore-nulls `last` over the
    * user's (ts, event_id)-total-ordered history — the frame's `1 PRECEDING`
    * upper bound encodes "strictly prior" so a same-row purchase can never
    * credit itself, and intervening purchases (touch = null) are skipped,
    * not resetting the channel. Revenue sums ride DECIMAL(18,2) (the
    * 2-decimal event values are exact there) and cast back to double.
    * Scale: one shuffle on user_id; the window sort is the spill-safe
    * sort-based exec; the final groupBy is 3 rows.
    */
  val q_attribution: Q = Q(
    "q_attribution",
    Some("""
      WITH lt AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
        FROM events
      )
      SELECT coalesce(channel, 'direct') AS channel,
             COUNT(*) AS n_purchases,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
      FROM lt WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("click", "view"), col("event_type"))
    Tables.events(s, d)
      .withColumn("channel", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("attributed_value"),
      )
      .orderBy("channel")
  }

  /** Linear (multi-touch) attribution — the last-touch model's fairness
    * counterpart: every touch before a purchase shares its value equally, so
    * a channel's credit for one purchase is value · touches_of_channel / k.
    * The split rides integer fixed-point micros — value is exact in
    * DECIMAL(18,2), ×1e6 to a BIGINT, and the share is a TRUNCATING integer
    * multiply-divide, identical on both engines — so the per-channel sums
    * are exact integers with no float accumulation order anywhere (the trap
    * in any naive Σ value/k of doubles). Prior-touch counts are two
    * conditional window counts over the same (ts, event_id)-total-ordered
    * frame last-touch uses; the final 3-row answer unpacks from ONE global
    * aggregate row (no second shuffle), q_profile_columns-style.
    */
  val q_attribution_linear: Q = Q(
    "q_attribution_linear",
    Some("""
      WITH h AS (
        SELECT event_type, value,
               COUNT(*) FILTER (WHERE event_type = 'click') OVER w AS c_click,
               COUNT(*) FILTER (WHERE event_type = 'view')  OVER w AS c_view
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ), p AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000 AS vm,
               c_click, c_view, c_click + c_view AS k
        FROM h WHERE event_type = 'purchase'
      ), a AS (
        SELECT COUNT(*) FILTER (WHERE c_click > 0) AS n_click,
               CAST(SUM(CASE WHEN k > 0 THEN vm * c_click // k ELSE 0 END) AS BIGINT) AS m_click,
               COUNT(*) FILTER (WHERE k = 0) AS n_direct,
               CAST(SUM(CASE WHEN k = 0 THEN vm ELSE 0 END) AS BIGINT) AS m_direct,
               COUNT(*) FILTER (WHERE c_view > 0) AS n_view,
               CAST(SUM(CASE WHEN k > 0 THEN vm * c_view // k ELSE 0 END) AS BIGINT) AS m_view
        FROM p
      )
      SELECT 'click' AS channel, n_click AS n_purchases, m_click AS credited_micros FROM a
      UNION ALL SELECT 'direct', n_direct, m_direct FROM a
      UNION ALL SELECT 'view', n_view, m_view FROM a
      ORDER BY channel
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val p = Tables.events(s, d)
      .withColumn("c_click", count(when(col("event_type") === "click", 1)).over(w))
      .withColumn("c_view", count(when(col("event_type") === "view", 1)).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("vm",
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType) * lit(10000L))
      .withColumn("k", col("c_click") + col("c_view"))
    val a = p.agg(
      count(when(col("c_click") > 0, 1)).as("n_click"),
      sum(when(col("k") > 0, expr("vm * c_click div k")).otherwise(0L)).as("m_click"),
      count(when(col("k") === 0, 1)).as("n_direct"),
      sum(when(col("k") === 0, col("vm")).otherwise(0L)).as("m_direct"),
      count(when(col("c_view") > 0, 1)).as("n_view"),
      sum(when(col("k") > 0, expr("vm * c_view div k")).otherwise(0L)).as("m_view"),
    )
    a.select(expr(
      "stack(3, 'click', n_click, m_click, 'direct', n_direct, m_direct, " +
        "'view', n_view, m_view) AS (channel, n_purchases, credited_micros)"))
      .orderBy("channel")
  }

  def all: Seq[Q] =
    Seq(q_w1_running_max, q_d1_dedup_first, q_asof_click_purchase, q_sessionize,
      q_window_trailing, q_attribution, q_attribution_linear)
}
