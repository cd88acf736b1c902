package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, DedupProbe}
import graft.util.Tables

/** Scale-probe harness for the banded dedup joins (the SCALEPROBE.md
  * candidate-volume decompositions): per-geometry bucket-size histograms
  * with implied SMJ compare counts, distinct candidate-pair counts, and
  * signature-prefilter survivor counts. Performance diagnostics over a
  * probe directory — never a correctness input.
  *
  * Usage: runMain graft.DedupScaleProbe <sfDir> [buckets|cands]
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = if (args.length > 1) args(1) else "cands"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val sets = Dedup.hashedShingleSets(docs).filter(col("sz") > 0).localCheckpoint()
    val sig = Dedup.withSignature(sets).localCheckpoint()

    if (mode == "buckets") {
      // bucket-size histogram per band geometry: where SMJ compare counts
      // and pre-cap candidate volumes come from
      def hist(name: String, banded: org.apache.spark.sql.DataFrame): Unit = {
        println(s"=== $name bucket histogram ===")
        banded.groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
          .groupBy(
            when(col("n") === 1, "a:1").when(col("n") <= 16, "b:2-16")
              .when(col("n") <= 256, "c:17-256").when(col("n") <= 4096, "d:257-4k")
              .otherwise("e:>4k").as("size"))
          .agg(count(lit(1)).as("buckets"), sum("n").as("rows"),
            sum(col("n") * col("n")).as("smj_compares"),
            sum(when(col("n") <= Dedup.bandBucketCap, col("n") * (col("n") - 1) / 2)
              .otherwise(col("n") * 2)).as("capped_cand_rows"))
          .orderBy("size").show(false)
      }
      hist("jaccard-16x4", DedupProbe.banded(sig, Dedup.numBands, Dedup.rowsPerBand))
      hist("containment-32x2", DedupProbe.banded(sig, Dedup.cSketchBands, Dedup.cSketchRows))
    } else {
      val jc = DedupProbe.minhashCandidates(docs).localCheckpoint()
      val jn = jc.count()
      val jk = DedupProbe.prefiltered(jc, DedupProbe.sigBytes(sig),
        (_, _) => lit(0.5), Dedup.rowsPerBand * 0.5).count()
      println(s"JACCARD t=0.5: candidates=$jn prefilter_survivors=$jk")
      val cc = DedupProbe.containmentCandidates(sets, sig).localCheckpoint()
      val cn = cc.count()
      val ck = DedupProbe.prefiltered(cc, DedupProbe.sigBytes(sig),
        (szI, szJ) => lit(0.8) / (lit(1.0) + szJ / szI - lit(0.8))).count()
      println(s"CONTAINMENT t=0.8: candidates=$cn prefilter_survivors=$ck")
    }
    spark.stop()
  }
}
