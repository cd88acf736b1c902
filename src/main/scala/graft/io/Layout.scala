package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for the 100 TB path (SURVEY.md §4): bucketing for
  * co-located joins and partitioned layouts for partition pruning. Neither
  * changes query code — the scan planner picks the benefit up from the
  * catalog/file layout.
  */
object Layout {

  /** Write a table bucketed (and sorted) by its join key. Two facts bucketed
    * the same way join with NO Exchange and no sort: at scale that deletes
    * the single largest shuffle an analytics job has. Bucketed tables live
    * in the session catalog (saveAsTable — bucket metadata has to survive
    * for the planner to trust the layout).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Curated-zone layout partitioned by a low-cardinality column: scans with
    * an equality/range filter on the partition column prune whole
    * directories before any I/O (PartitionFilters in the scan node).
    */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)
}
