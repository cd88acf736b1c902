package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-module inventories (graft.queries.*,
  * graft.text.*, graft.dedup.*, graft.similarity.*); each module exposes
  * `all: Seq[Q]` pairing the Spark plan with its DuckDB oracle SQL.
  */
object SparkEntry {

  /** The ad-library pipeline itself, exposed to the gate as rows-only
    * checks: its raw nested-JSON input is not a DuckDB-queryable table, so
    * no oracle SQL — correctness is pinned by AdPipelineSpec's goldens.
    */
  private def etlQueries: Seq[Q] = Seq(
    Q("etl_report_top10", None)((s, _) => graft.etl.AdPipeline.fixtureRun(s).report),
    Q("etl_curated", None)((s, _) => graft.etl.AdPipeline.fixtureRun(s).curated),
    Q("etl_quarantine", None)((s, _) => graft.etl.AdPipeline.fixtureRun(s).quarantine),
  )

  private def modules: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Windows.all ++
      graft.queries.Scalars.all ++
      graft.text.TextAnalysis.all ++
      graft.dedup.Dedup.all ++
      graft.similarity.Similarity.all ++
      etlQueries

  /** Flagship: the full reference pipeline (scan → flatten → derive →
    * validate/quarantine → 3-pass dedup → top-10 report) on the fixture
    * document. Driver smoke-checks rows>0 (7 report rows).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.etl.AdPipeline.fixtureRun(spark).report

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
