package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive compute balancing (round 17, optimization guide §2.5
  * "input skew"): a stage's parallelism defaults to whatever the scan gives
  * it, and the driver's parquet fixtures are single-row-group files — so any
  * input smaller than cores × maxPartitionBytes reaches a compute-dense
  * operator (shingle kernel, Expand-based multi-distinct/cube, exact
  * percentile state build) as ONE task, serializing the whole stage
  * (measured 0.7–1.9 s single-task map stages at sf0.1). Above that size the
  * scan splits past the core count by itself, where the balancing exchange
  * would be a full-input shuffle nobody wants — so the repartition fires
  * ONLY below it.
  *
  * The trigger reads Catalyst's sizeInBytes estimate (driver-only, no job):
  * exact for file scans, conservatively huge for joins — computed frames
  * therefore keep their existing shape. Cost when it fires is bounded by
  * definition: less than cores × maxPartitionBytes moves, once. Callers must
  * only use it where results are partition-order-independent (exact
  * aggregates: counts, decimals, min/max, sort-based percentiles — never
  * bare double sums).
  */
object Balance {
  def ifNarrow(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    // A/B kill-switch (and production escape hatch): results are
    // balance-invariant by construction, so flipping this only moves
    // parallelism, never rows.
    val on = spark.conf.get("spark.graft.balance.enabled", "true").toBoolean
    val par = spark.sparkContext.defaultParallelism
    val split = spark.sessionState.conf.filesMaxPartitionBytes
    lazy val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (on && est < BigInt(split) * par) df.repartition(par, keys: _*) else df
  }
}
