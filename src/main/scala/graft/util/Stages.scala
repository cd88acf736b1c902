package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Eager stage materialization with deterministic checkpoint release.
  *
  * Multi-stage compositions (the curation pipeline) chain operators that
  * each localCheckpoint multi-GB internals (shingle sets, compact LSH
  * signatures, cluster labels). Declared as ONE lazy DAG, every stage's
  * checkpoint RDD stays referenced by the final plan until the query
  * finishes, so peak block-manager footprint is the SUM of all stages —
  * at the 5M-doc probe that sum is what pushed the e2e pipeline past the
  * default 8 GB heap (16 GB was needed; SCALEPROBE round-12). The
  * ContextCleaner cannot help: it frees an RDD only after the JVM GC
  * proves it unreachable, and a live plan reference is reachability.
  *
  * [[released]] restores the per-stage peak: it runs `body` NOW,
  * materializes its (small) output via localCheckpoint, then explicitly
  * unpersists every persistent RDD the stage created on the way — except
  * the output's own checkpoint, identified from the LogicalRDD leaves of
  * the materialized frame. Safe because localCheckpoint truncates
  * lineage at first materialization: once the output frame is computed,
  * nothing downstream can reference the released internals. This is the
  * single-JVM analogue of a cluster stage writing its boundary frame to
  * the shuffle store and letting the executors drop stage-local state.
  *
  * Use at STAGE boundaries whose output is small relative to the stage's
  * working set (a keep set of doc_ids, a (doc_id, split) assignment) —
  * the checkpoint cost is proportional to the boundary frame, not the
  * stage internals.
  */
object Stages {

  def released(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = body.localCheckpoint()
    val keep = out.queryExecution.analyzed.collectLeaves().collect {
      case lr: LogicalRDD => lr.rdd.id
    }.toSet
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id) && !keep.contains(id))
        rdd.unpersist(blocking = false)
    }
    out
  }
}
