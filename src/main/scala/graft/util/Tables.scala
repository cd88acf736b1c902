package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.TimestampNTZType

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the same
  * plan runs unchanged from sf0.001 smoke to a 100 TB production layout: the
  * scan is a plain parquet source and Catalyst pushes filters/projections
  * into it (vectorized reader, row-group pruning).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across driver testdata generations, so adapt to the
    * read schema. NANOS is unreadable natively in Spark 4: read it as a
    * nanos long (legacy conf) and truncate to microseconds (lossless on
    * this data; DuckDB does the same ns→µs truncation). Either way the
    * column ends as NTZ so dumps compare naively against the oracle — the
    * session runs in UTC so LTZ→NTZ preserves wall time.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts DIV 1000"))
      case _ => raw.col("ts")
    }
    raw.withColumn("ts", ts.cast(TimestampNTZType))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  private val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events" -> events _,
  ).withDefault(name => (s, d) => table(s, d, name))

  /** SQL façade: registers every synthetic table as a temp view (and the
    * native functions), so the full inventory is addressable via
    * `spark.sql(...)` with the same scan behavior as the DataFrame API.
    */
  def registerViews(s: SparkSession, sfDir: String): Unit = {
    graft.functions.VectorFunctions.ensureRegistered(s)
    names.foreach(n => loaders(n)(s, sfDir).createOrReplaceTempView(n))
  }
}

/** A named query paired with its DuckDB oracle SQL (None = rows-only check:
  * the operator is not expressible in ANSI SQL, e.g. probabilistic sketches).
  */
final case class Q(
    name: String,
    oracle: Option[String],
)(val run: (SparkSession, String) => DataFrame)
