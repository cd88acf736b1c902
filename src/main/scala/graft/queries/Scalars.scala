package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.{Q, Tables}

/** Scalar-function surface (SURVEY.md §2.7 F1-F9) and the validation split
  * (§2.4 V1-V5), exercised over orders/events/documents. All pure built-in
  * Column expressions — whole-stage-codegen'd, no UDFs (§2.8).
  */
object Scalars {

  /** F1-F5 analog on orders: string concat link, epoch extraction,
    * conditional NULL date, coalesce-derivation, floor-division bucketing.
    * (Rounding is pinned via floor() — identical in Spark and DuckDB;
    * the entry pipeline itself uses bround = half-even per SURVEY §7.2.)
    */
  val q_f_scalar_derive: Q = Q(
    "q_f_scalar_derive",
    Some("""
      SELECT o_orderkey,
             'https://orders/view?id=' || CAST(o_orderkey AS VARCHAR) AS order_link,
             epoch_ms(o_orderdate) AS order_epoch_ms,
             CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderdate END AS closed_date,
             CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
             CAST(year(o_orderdate) AS INTEGER) AS order_year,
             COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS priority
      FROM orders
      ORDER BY o_orderkey
    """),
  ) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        concat(lit("https://orders/view?id="), col("o_orderkey").cast(StringType))
          .as("order_link"),
        unix_millis(col("o_orderdate").cast(TimestampType)).as("order_epoch_ms"),
        when(col("o_orderstatus") === "O", lit(null).cast(TimestampType))
          .otherwise(col("o_orderdate")).as("closed_date"),
        floor(col("o_totalprice") / 1000).cast(LongType).as("price_k"),
        year(col("o_orderdate")).as("order_year"),
        coalesce(
          when(col("o_orderpriority") === "4-NOT SPECIFIED", lit(null))
            .otherwise(col("o_orderpriority")),
          lit("unspecified"),
        ).as("priority"),
      )
      .orderBy("o_orderkey")
  }

  /** P4-style conditional extraction (CASE over branches) on documents. */
  val q_p4_conditional: Q = Q(
    "q_p4_conditional",
    Some("""
      SELECT doc_id,
             CASE WHEN lang IN ('en', 'es') THEN substr(text, 1, 20)
                  ELSE upper(source) END AS head,
             CASE WHEN n_chars >= 300 THEN 'long'
                  WHEN n_chars >= 150 THEN 'medium'
                  ELSE 'short' END AS size_class
      FROM documents
      ORDER BY doc_id
    """),
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        when(col("lang").isin("en", "es"), substring(col("text"), 1, 20))
          .otherwise(upper(col("source"))).as("head"),
        when(col("n_chars") >= 300, "long")
          .when(col("n_chars") >= 150, "medium")
          .otherwise("short").as("size_class"),
      )
      .orderBy("doc_id")
  }

  /** V1-V5 validation split (transform_raw_data.py:166-179 re-expressed):
    * a when-chain derives the FIRST failing rule's message; the quarantine
    * branch is this filter, the valid branch is its complement — one pass,
    * no exceptions, exactly the reference's first-error semantics.
    */
  val q_v5_validation_quarantine: Q = Q(
    "q_v5_validation_quarantine",
    Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice <= 0 THEN 'price_not_positive'
                  WHEN o_totalprice > 450000 THEN 'price_above_max'
                  WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 'unknown_status'
                  WHEN o_orderstatus = 'P' AND o_orderpriority = '5-LOW'
                       THEN 'low_priority_pending'
                  END AS validation_error
      FROM orders
      WHERE CASE WHEN o_totalprice <= 0 THEN 'price_not_positive'
                 WHEN o_totalprice > 450000 THEN 'price_above_max'
                 WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 'unknown_status'
                 WHEN o_orderstatus = 'P' AND o_orderpriority = '5-LOW'
                      THEN 'low_priority_pending'
                 END IS NOT NULL
      ORDER BY o_orderkey
    """),
  ) { (s, d) =>
    val err =
      when(col("o_totalprice") <= 0, "price_not_positive")
        .when(col("o_totalprice") > 450000, "price_above_max")
        .when(!col("o_orderstatus").isin("O", "F", "P"), "unknown_status")
        .when(col("o_orderstatus") === "P" && col("o_orderpriority") === "5-LOW",
          "low_priority_pending")
    Tables.orders(s, d)
      .withColumn("validation_error", err)
      .filter(col("validation_error").isNotNull)
      .select("o_orderkey", "validation_error")
      .orderBy("o_orderkey")
  }

  /** JSON extraction (events.props is a JSON string — from_json /
    * get_json_object; SURVEY §2.7 note on the extended surface).
    */
  val q_events_json_agg: Q = Q(
    "q_events_json_agg",
    Some("""
      SELECT event_type,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             COUNT(*) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """),
  ) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"),
      )
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Tumbling-window aggregation in batch (streaming twin lives in
    * graft.streaming): hourly event counts + exact value sums.
    */
  val q_events_hourly: Q = Q(
    "q_events_hourly",
    Some("""
      SELECT date_trunc('hour', ts) AS hour_start,
             event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2
    """),
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"),
      )
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"),
      )
      .orderBy("hour_start", "event_type")
  }

  def all: Seq[Q] = Seq(
    q_f_scalar_derive, q_p4_conditional, q_v5_validation_quarantine,
    q_events_json_agg, q_events_hourly,
  )
}
