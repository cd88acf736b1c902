package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.{Q, Tables}

/** Explicit skew mitigation (SURVEY.md §4 / builder brief "salting for
  * skew"). AQE rebalances skewed JOIN partitions at runtime, but a groupBy
  * whose key space is tiny (here: 3 return flags over every lineitem row)
  * puts each key's entire partial-aggregate merge on one reducer no matter
  * how large the data. Salting splits each hot key across `nSalts` reducers
  * and re-merges — same result for any decomposable aggregate, hottest
  * reducer bounded to ~1/nSalts of the hottest key.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. The salt is derived DETERMINISTICALLY from row
    * content (xxhash64 over `saltCols`): a nondeterministic source (row id,
    * rand) above a shuffle is retry-unsafe — a fetch-failure stage retry
    * recomputes a map task with different salts, and a reducer that already
    * consumed the old generation double-counts or drops rows.
    * Content-hashing gives the same spread with a stable row→bucket
    * assignment across retries and speculative attempts.
    *
    * `saltCols` should be stable HIGH-ENTROPY columns — ideally a row id /
    * unique-key column: rows identical across every hashed column all land
    * in one salt bucket (the salting degenerates to nothing for them), and
    * the all-columns default fails analysis if the frame carries an
    * unhashable column type (MapType).
    */
  def saltedAgg(df: DataFrame, key: String, nSalts: Int,
      saltCols: Seq[Column] = Nil)(
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val src = if (saltCols.nonEmpty) saltCols else df.columns.map(col).toSeq
    df.withColumn("__salt", pmod(xxhash64(src: _*), lit(nSalts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted sum/count over the 3-value l_returnflag key — the same answer
    * as a direct groupBy (the oracle is the plain SQL aggregate), computed
    * through the two-phase plan.
    */
  val q_skew_salted_agg: Q = Q(
    "q_skew_salted_agg",
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """),
  ) { (s, d) =>
    // (l_orderkey, l_linenumber) is the table's unique key — maximal salt
    // entropy even when payload columns repeat
    saltedAgg(Tables.lineitem(s, d), "l_returnflag", nSalts = 16,
      saltCols = Seq(col("l_orderkey"), col("l_linenumber")))(
      partial = Seq(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("p_sum"),
        count(lit(1)).as("p_n")),
      finalAgg = Seq(
        sum(col("p_sum")).cast(DoubleType).as("sum_qty"),
        sum(col("p_n")).as("n")),
    ).orderBy("l_returnflag")
  }

  /** Approximate COUNT(DISTINCT) via HyperLogLog++ — at 100 TB an exact
    * distinct count shuffles every distinct value; the sketch shuffles a
    * fixed-size buffer per group. Rows-only (DuckDB's approx algorithm
    * differs); the error bound vs exact is pinned in SkewSpec.
    */
  val q_approx_distinct: Q = Q("q_approx_distinct", None) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Skew mitigation for WINDOWS: a running max partitioned only by
    * user_id puts a hot user's entire history on one reducer. Because max
    * is associative, the prefix aggregate decomposes into two levels:
    * intra-chunk running max over (user, day) — many small partitions —
    * plus an exclusive prefix max over the per-chunk summaries (a frame
    * thousands of times smaller), combined with greatest(). Day chunks
    * respect the (ts, event_id) total order since the day is a prefix of
    * ts, so the result is row-identical to the single-partition window —
    * which is exactly what the oracle checks.
    */
  val q_skew_chunked_window: Q = Q(
    "q_skew_chunked_window",
    Some("""
      SELECT user_id, event_id, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_max_value
      FROM events
      ORDER BY user_id, event_id
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .withColumn("chunk", date_trunc("day", col("ts")))
    val wIntra = Window.partitionBy("user_id", "chunk")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy("user_id").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = ev.groupBy("user_id", "chunk")
      .agg(max(col("value")).as("chunk_max"))
      .select(col("user_id"), col("chunk"),
        max(col("chunk_max")).over(wPrev).as("prev_max"))
    ev.withColumn("intra_max", max(col("value")).over(wIntra))
      .join(summaries, Seq("user_id", "chunk"))
      .select(col("user_id"), col("event_id"), col("value"),
        when(col("prev_max").isNull, col("intra_max"))
          .otherwise(greatest(col("intra_max"), col("prev_max"))).as("run_max_value"))
      .orderBy("user_id", "event_id")
  }

  /** Salted JOIN — the third skew tool (agg and window above): when one
    * join key is hot, every matching fact row lands on one reducer. Salting
    * replicates the dimension nSalts times (explode over the salt range)
    * and gives each fact row a uniform salt, so the equi-join key becomes
    * (key, salt) and the hot key spreads over nSalts reducers. Row-for-row
    * identical to the unsalted join — the oracle is the plain SQL join.
    * (AQE's skew-join handles sort-merge skew at runtime; explicit salting
    * is the declarative fallback that also covers hash joins and stateful
    * streaming joins.)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, nSalts: Int,
      saltCols: Seq[Column] = Nil): DataFrame = {
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    // salt source: deterministic content hash over the fact row — the dim
    // carries every salt value so any assignment joins correctly, but a
    // retry-recomputed map task must re-derive the SAME salts or a partial
    // stage retry above this shuffle can double-count/drop rows (the
    // monotonically_increasing_id hazard). Same saltCols guidance as
    // [[saltedAgg]]: prefer a unique row-id column — fully identical rows
    // share a bucket under the all-columns default, and MapType columns
    // fail analysis in xxhash64.
    val src = if (saltCols.nonEmpty) saltCols else fact.columns.map(col).toSeq
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(src: _*), lit(nSalts.toLong)).cast(IntegerType))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-user max-gap through the salted join: the user dimension is
    * derived, replicated ×16, and joined back to the event stream on
    * (user_id, salt). Gap sums run through exact DECIMAL (the engine-wide
    * double-merge-order rule). The dimension attribute is the user MAX —
    * not the mean — deliberately: value and user_max both carry short
    * decimal expansions, so the per-row double→DECIMAL cast rounds
    * identically on both engines, whereas a mean's repeating expansion made
    * the same cast diverge in the 7th digit (observed 4-cell hash break).
    */
  val q_skew_salted_join: Q = Q(
    "q_skew_salted_join",
    Some("""
      WITH dim AS (
        SELECT user_id, MAX(value) AS user_max
        FROM events GROUP BY user_id
      )
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(user_max - value AS DECIMAL(18,6))) AS DOUBLE) AS sum_gap
      FROM events JOIN dim USING (user_id)
      GROUP BY event_type
      ORDER BY event_type
    """),
  ) { (s, d) =>
    val events = Tables.events(s, d)
    val dim = events.groupBy("user_id").agg(max(col("value")).as("user_max"))
    // event_id is the stream's unique key — see saltCols guidance above
    saltedJoin(events, dim, "user_id", nSalts = 16, saltCols = Seq(col("event_id")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum((col("user_max") - col("value")).cast(DecimalType(18, 6)))
          .cast(DoubleType).as("sum_gap"),
      )
      .orderBy("event_type")
  }

  /** Skew DIAGNOSIS — the profiler run before choosing a mitigation
    * (salting, chunking, AQE hints): per-key frequency distribution of a
    * join/partition key, reduced to the numbers that matter — hottest keys
    * and the max/mean skew factor. Two cheap aggregations; output bounded
    * by k regardless of data volume.
    */
  val q_skew_profile: Q = Q(
    "q_skew_profile",
    Some("""
      WITH per_key AS (
        SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
      ), stats AS (
        SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n FROM per_key
      )
      SELECT key, n,
             n / mean_n AS skew_factor,
             ROW_NUMBER() OVER (ORDER BY n DESC, key) AS hot_rank
      FROM per_key CROSS JOIN stats
      QUALIFY hot_rank <= 10
      ORDER BY hot_rank
    """),
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val perKey = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = perKey.agg((sum(col("n")).cast(DoubleType) / count(lit(1))).as("mean_n"))
    // TakeOrdered top-10 FIRST; the ranking window then runs over 10 rows —
    // a global row_number over per-key counts would single-partition-sort
    // the whole key space
    perKey.crossJoin(broadcast(stats))
      .orderBy(col("n").desc, col("key"))
      .limit(10)
      .select(col("key"), col("n"),
        (col("n") / col("mean_n")).as("skew_factor"),
        row_number().over(Window.orderBy(col("n").desc, col("key"))).as("hot_rank"))
      .orderBy("hot_rank")
  }

  def all: Seq[Q] = Seq(
    q_skew_salted_agg, q_approx_distinct, q_skew_chunked_window, q_skew_salted_join,
    q_skew_profile)
}
