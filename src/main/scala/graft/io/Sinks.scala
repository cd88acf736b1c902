package graft.io

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.DataFrame

/** Engine-boundary sinks (SURVEY.md §2.1 S6/S8/S9/S11). Run artifacts are
  * run-id DIRECTORIES (the reference's timestamped-filename convention,
  * minus its `filename_` bug — utils/base.py:4-8, semantics kept, bug not).
  */
object Sinks {

  /** F9: run id from an injected clock (reference strftime format,
    * utils/base.py:6). Injected, not Instant.now(), so runs are reproducible
    * and tests can pin collisions away (SURVEY §7.2).
    */
  def runId(now: Instant): String =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC).format(now)

  /** `<base>/<name>_<runid>` — the non-overwriting run-artifact convention. */
  def runDir(base: String, name: String, now: Instant): String =
    s"$base/${name}_${runId(now)}"

  /** S6: raw-JSON landing sink. Each document lands in its own
    * `doc_id=<id>` directory (partitionBy), so a whole-text reader sees one
    * document per file and array order inside a document survives — the
    * property the ordinal-based semantics depend on (SURVEY §7.1). Append
    * mode: landing is incremental by nature (collect_raw_data.py:150-171).
    */
  def rawJsonLanding(rawDocs: DataFrame, dir: String): Unit =
    rawDocs.write.partitionBy("doc_id").mode("append").text(dir)

  /** S8: quarantine side-channel — record struct + validation_error. */
  def quarantineJson(quarantine: DataFrame, dir: String): Unit =
    quarantine.write.mode("overwrite").json(dir)

  /** S9: curated parquet. Never coalesced — partition count is the
    * downstream parallelism at scale.
    */
  def curatedParquet(curated: DataFrame, dir: String): Unit =
    curated.write.mode("overwrite").parquet(dir)

  /** S11: report CSV. coalesce(1) is fine here and only here: the report is
    * top-k rows by construction (SURVEY §7.6).
    */
  def reportCsv(report: DataFrame, dir: String): Unit =
    report.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)

  /** ORC curated sink — identical contract to the parquet sink (never
    * coalesced); kept so the curated layer can match whichever columnar
    * format the surrounding lake standardizes on.
    */
  def curatedOrc(curated: DataFrame, dir: String): Unit =
    curated.write.mode("overwrite").orc(dir)

  /** Curated zone as a snapshot TABLE (the "Delta output" half of the
    * baseline's contract): first run creates version 1; every later run is
    * a copy-on-write MERGE keyed by ad_id, so re-running a collection —
    * the reference's normal retry mode — upserts instead of duplicating or
    * clobbering, old versions stay readable for audit, and only files
    * containing re-collected ads rewrite. Returns the committed version.
    */
  def curatedSnapshot(curated: DataFrame, dir: String): Int =
    if (!SnapshotTable.exists(dir))
      SnapshotTable.create(curated, dir)
    else
      SnapshotTable.merge(curated.sparkSession, dir, curated, "ad_id")
}
