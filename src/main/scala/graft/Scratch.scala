package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = graft.util.Tables.documents(spark, sfDir)

    // Phase 1: hashed shingle sets materialization
    val sets = graft.dedup.Dedup.hashedShingleSets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    time("sets materialize")(sets.count())

    // Phase 2: exact SSJ pairs (sets already cached)
    val pairs = time("ssj pairs") {
      val p = graft.dedup.Dedup.setSimilarityJoin(docs, 0.5)
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }

    // Phase 3: connected components on cached pairs
    val cc = time("connected components") {
      val c = graft.dedup.Dedup.connectedComponents(pairs)
      c.write.format("noop").mode("overwrite").save()
      c
    }

    // Phase 4: cluster assignment window + orderBy
    time("assignment window") {
      cc.select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    // Phase 5: alternating variant for comparison
    time("alternating cc") {
      graft.dedup.Dedup.connectedComponentsAlternating(pairs)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
