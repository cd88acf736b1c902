package graft.io

import org.apache.spark.sql.DataFrame

/** Engine-boundary sinks (SURVEY.md §2.1 S6/S8/S9/S11). Run artifacts are
  * run-id DIRECTORIES (the reference's timestamped-filename convention,
  * minus its `filename_` bug — utils/base.py:4-8, semantics kept, bug not).
  */
object Sinks {

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
}
