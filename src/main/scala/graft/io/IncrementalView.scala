package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate over a [[SnapshotTable]] — the
  * Delta/Iceberg-style "change feed + MERGE" view-maintenance loop, for
  * ADDITIVE aggregates (count + sums). Additive is exactly the class the
  * file-granular [[SnapshotTable.changesBetween]] feed supports
  * losslessly: a copy-on-write rewrite re-emits its unchanged rows as
  * (delete, insert) pairs whose contributions cancel in the delta.
  *
  * Why this exists at 100 TB: a refresh reads ONLY the files the commits
  * since the last refresh touched, so a running per-source token ledger
  * over a petabyte corpus costs per refresh what the day's ingest cost —
  * never a corpus rescan. The view is itself a SnapshotTable (versioned,
  * time-travelable, mergeable), and its manifest meta records the exact
  * source version it reflects, which makes refresh idempotent and
  * crash-safe: re-refreshing an already-reflected version is a no-op, and
  * a crash between the source commit and the view merge just leaves the
  * next refresh a slightly larger delta.
  *
  * Keys are carried both as columns and as one synthesized `mv_key`
  * (unit-separator concat) because MERGE upserts by a single key column;
  * a key whose net row count reaches zero is tombstoned out of the view.
  */
object IncrementalView {

  val sourceVersionKey = "mv_source_version"
  val countCol = "mv_count"
  private val keyCol = "mv_key"
  private val dropCol = "mv_drop"

  // unit-separator join, NUL marker for SQL null: distinct key tuples
  // cannot collide unless a key VALUE itself contains the separators
  private def mvKey(keys: Seq[String]) =
    concat_ws("\u001F",
      keys.map(k => coalesce(col(k).cast("string"), lit("\u0000"))): _*)

  /** Full-compute the view at the source's latest version; returns that
    * version.
    */
  def create(spark: SparkSession, sourceDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String]): Int = {
    val v = SnapshotTable.latestVersion(sourceDir)
    val agg = SnapshotTable.read(spark, sourceDir, Some(v))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countCol), sumCols.map(c => sum(col(c)).as(c)): _*)
      .withColumn(keyCol, mvKey(keys))
    SnapshotTable.create(agg, viewDir, meta = Map(sourceVersionKey -> v.toString))
    v
  }

  /** Refresh the view to the source's latest version from the change feed
    * alone; returns the source version the view now reflects (equal input
    * and output version = the refresh was a no-op).
    */
  def refresh(spark: SparkSession, sourceDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String]): Int = {
    val have = SnapshotTable.snapshot(spark, viewDir, None).meta
      .getOrElse(sourceVersionKey,
        throw new IllegalStateException(
          s"$viewDir carries no $sourceVersionKey — not an IncrementalView table"))
      .toInt
    val latest = SnapshotTable.latestVersion(sourceDir)
    if (latest <= have) return have
    val sign = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val delta = SnapshotTable.changesBetween(spark, sourceDir, have, latest)
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as(countCol), sumCols.map(c => sum(sign * col(c)).as(c)): _*)
    val valCols = countCol +: sumCols
    val old = valCols.foldLeft(SnapshotTable.read(spark, viewDir, None))(
      (df, c) => df.withColumnRenamed(c, s"__old_$c"))
      .drop(keyCol)
    val changes = delta.join(old, keys, "left")
      .select(
        keys.map(col) ++
          valCols.map(c =>
            (coalesce(col(s"__old_$c"), lit(0L)) + col(c)).as(c)) ++
          Seq(mvKey(keys).as(keyCol)): _*)
      .withColumn(dropCol, col(countCol) === 0)
    SnapshotTable.merge(spark, viewDir, changes, keyCol,
      deleteCol = Some(dropCol),
      meta = Map(sourceVersionKey -> latest.toString))
    latest
  }
}
