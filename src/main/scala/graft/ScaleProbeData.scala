package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data amplifier: writes a FACTOR× copy of a testdata
  * directory by unioning key-shifted replicas (each fact table's keys are
  * offset by replica·(max+1), so uniqueness and join fan-outs are
  * preserved; dimension tables region/nation stay fixed, as TPC-H scaling
  * does). Used for the committed SCALEPROBE.md runs — a PERFORMANCE
  * harness over /tmp, never a correctness input (oracle runs stay on the
  * driver's own parquet).
  *
  * Usage: runMain graft.ScaleProbeData <srcSfDir> <outDir> <factor>
  */
object ScaleProbeData {

  /** Columns to shift per table (primary key + the foreign keys that must
    * follow their parent's shift so per-key group sizes stay constant).
    */
  private val shiftCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
  )

  /** The shift base of a column is shared with its parent table's key so
    * replicas join onto the matching replica (o_custkey shifts by
    * customer's base, not orders').
    */
  private val baseOf: Map[String, String] = Map(
    "o_custkey" -> "c_custkey", "l_orderkey" -> "o_orderkey",
    "l_partkey" -> "p_partkey", "l_suppkey" -> "s_suppkey",
  ).withDefault(identity)

  def amplify(table: String, df: DataFrame, cols: Seq[String],
      bases: Map[String, Long], factor: Int): DataFrame =
    // dimension tables (no shift columns) stay FIXED — one copy, as TPC-H
    // scaling does. Unioning identical replicas would duplicate every
    // dimension key, fanning each nation/region join out by the factor and
    // turning the probe's join ratios into a data artifact.
    if (cols.isEmpty) df
    else (0 until factor).map { i =>
      val shifted = cols.foldLeft(df) { (acc, c) =>
        acc.withColumn(c, col(c) + lit(i * bases(baseOf(c))))
      }
      mutate(table, shifted, i)
    }.reduce(_ unionAll _)

  /** Replicas must not be DUPLICATES of each other: the source corpus has
    * a ~0.2% exact-dup rate, and shipping 10 identical copies of every
    * document would turn that into 90% — every pair-emitting dedup query
    * would then grow with the SQUARE of the amplification factor by
    * construction of the data, not by any property of the plan. Replica
    * i > 0 therefore gets a replica tag interleaved into the text every
    * other token (3-gram shingles always span a tag, so cross-replica
    * near-dup similarity collapses below threshold while intra-replica
    * structure keeps the source's dup rate), and each embedding gets one
    * coordinate bumped by a replica-dependent offset (cosine is
    * scale-invariant, so a bump — not a scale — is what separates
    * replicas).
    */
  private def mutate(table: String, df: DataFrame, i: Int): DataFrame =
    table match {
      case "documents" if i > 0 =>
        val tagged = array_join(
          zip_with(
            split(col("text"), " "),
            sequence(lit(0), greatest(size(split(col("text"), " ")) - 1, lit(0))),
            (w, k) => when(k % 2 === 0, concat(lit(s"zr$i "), w)).otherwise(w)),
          " ")
        df.withColumn("text", when(col("text").isNull, col("text")).otherwise(tagged))
          .withColumn("n_chars", coalesce(length(col("text")), lit(0)).cast("long"))
      case "embeddings" if i > 0 =>
        df.withColumn("embedding",
          transform(col("embedding"),
            (v, k) => when(k === i % 64, v + lit(3.0f * i)).otherwise(v)))
      case _ => df
    }

  def main(args: Array[String]): Unit = {
    // optional 4th arg: comma-separated table subset — a FACTOR=100 probe
    // of one pipeline doesn't need 60M amplified lineitem rows on disk
    val Array(src, out, factorS) = args.take(3)
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else shiftCols.keySet
    val factor = factorS.toInt
    // compression defaults (zstd level 3 etc.) live in ONE place,
    // sys-prop-overridable for A/B probes: graft.util.EngineDefaults
    val spark = graft.util.EngineDefaults.withCompression(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // key bases first (max+1 per shifted key column, on its OWNER table) —
    // restricted to the bases the SELECTED tables actually shift by, so a
    // probe-of-a-probe (whose source dir holds only the subset's tables,
    // e.g. sf100 = sf10_probe x10) doesn't read absent parquet
    val neededBases: Set[String] =
      shiftCols.filter(kv => only(kv._1)).values.flatten.map(baseOf).toSet
    val bases: Map[String, Long] = shiftCols.toSeq.flatMap { case (t, cols) =>
      val own = cols.filter(c => baseOf(c) == c && neededBases(c))
      if (own.isEmpty) Nil
      else {
        val df = spark.read.parquet(s"$src/$t.parquet")
        own.map(c => c -> (df.agg(max(col(c))).head.getLong(0) + 1L))
      }
    }.toMap
    shiftCols.filter(kv => only(kv._1)).foreach { case (t, cols) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      // output partitioning must scale with OUTPUT rows, not the factor:
      // factor=10 over a 5M-row source once wrote 10 files of 5M rows /
      // 500k-row row groups, which starved the 8 GB heap's vectorized
      // reader at 32 concurrent tasks. Cap files at ~250k rows each.
      val outParts = math.max(
        math.max(spark.sparkContext.defaultParallelism, factor),
        (df.count() * factor / 250000L + 1L).toInt)
      amplify(t, df, cols, bases, factor)
        .repartition(outParts)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[probe] $t x$factor written ($outParts files)")
    }
    spark.stop()
  }
}
