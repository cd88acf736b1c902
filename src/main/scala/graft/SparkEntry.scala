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

  private def modules: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Windows.all ++
      graft.queries.Scalars.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
