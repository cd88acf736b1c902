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
    lazy val sets = Dedup.hashedShingleSets(docs).filter(col("sz") > 0).localCheckpoint()
    lazy val sig = Dedup.withSignature(sets).localCheckpoint()

    if (mode == "bottomk2") {
      // stage decomposition of the r13 one-exchange-at-a-time shape
      // (Dedup.bottomKCandidates + rescore), mirrored inline
      def t[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime(); val r = body
        println(f"[bottomk2] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val k = 16; val dfCap = 64; val tThr = 0.5
      def kEffOf(sz: org.apache.spark.sql.Column) = least(sz, lit(k))
      def bkAlpha(sz: org.apache.spark.sql.Column) =
        ceil((lit(tThr) - lit(0.3)) * kEffOf(sz) - lit(1e-9))
      graft.functions.ShingleHashFunctions.ensureRegistered(spark)
      val n = docs.count()
      val parts = math.max(spark.sparkContext.defaultParallelism,
        (n / 16384L + 1L).toInt)
      println(s"[bottomk2] n=$n parts=$parts")
      val setsU = docs.select(col("doc_id"),
        coalesce(graft.functions.ShingleHashFunctions.wordShingleHashes(col("text"), 3),
          array().cast("array<bigint>")).as("shh"))
        .withColumn("sz", size(col("shh")))
      val sets = t("array checkpoint (DISK_ONLY)")(
        setsU.filter(col("sz") > 0).localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.DISK_ONLY))
      val shards = ((n - 1) / 8000000L + 1L).toInt
      val useful = t(s"h-only df agg ($shards shard(s))")(
        (0 until shards).map { s0 =>
          sets.select(explode(col("shh")).as("h"))
            .filter(if (shards > 1) pmod(col("h"), lit(shards)) === s0 else lit(true))
            .repartition(parts, col("h"))
            .groupBy("h").agg(count(lit(1)).as("df"))
            .filter(col("df") > 1 && col("df") <= dfCap).select("h")
            .localCheckpoint()
        }.reduce(_ unionAll _))
      println(s"[bottomk2] n_useful=${useful.count()}")
      val capped = t("broadcast semi (map-side) + capped checkpoint")(
        sets.select(col("doc_id"),
            (kEffOf(col("sz")) - bkAlpha(col("sz")) + 1).as("p"),
            posexplode_outer(col("shh")).as(Seq("pos", "h")))
          .filter(col("h").isNotNull)
          .select(col("doc_id"), (col("pos") < col("p")).as("is_probe"), col("h"))
          .join(broadcast(useful), Seq("h"), "left_semi")
          .localCheckpoint())
      println(s"[bottomk2] capped rows=${capped.count()}")
      val cands = t("pair join + distinct")(
        capped.filter(col("is_probe"))
          .select(col("doc_id").as("i"), col("h"))
          .join(capped.select(col("doc_id").as("j"), col("h")), Seq("h"))
          .filter(col("i") =!= col("j"))
          .select(least(col("i"), col("j")).as("i"),
            greatest(col("i"), col("j")).as("j"))
          .distinct().localCheckpoint())
      println(s"[bottomk2] n_cands=${cands.count()}")
      val candIds = cands.select(col("i").as("doc_id"))
        .union(cands.select(col("j").as("doc_id"))).distinct()
      val candSets = t("pruned sets checkpoint")(
        sets.join(broadcast(candIds), Seq("doc_id"), "left_semi").localCheckpoint())
      val bkHits = graft.functions.ShingleHashFunctions.sortedIntersectCount(
        slice(col("shh_i"), lit(1), kEffOf(col("sz_i")).cast("int")), col("shh_j"))
      val inter = graft.functions.ShingleHashFunctions
        .sortedIntersectCount(col("shh_i"), col("shh_j"))
      t("rescore join")(cands
        .join(candSets.select(col("doc_id").as("i"), col("shh").as("shh_i"),
          col("sz").as("sz_i")), "i")
        .join(candSets.select(col("doc_id").as("j"), col("shh").as("shh_j"),
          col("sz").as("sz_j")), "j")
        .filter(bkHits >= bkAlpha(col("sz_i")))
        .withColumn("jaccard",
          inter * lit(1.0) / (col("sz_i") + col("sz_j") - inter))
        .filter(col("jaccard") >= tThr)
        .select("i", "j", "jaccard")
        .write.format("noop").mode("overwrite").save())
      spark.stop(); return
    }
    if (mode == "bottomk") {
      // stage decomposition of containmentBottomKJoin (r13 agg+anti-join
      // shape) at the probe scale, with the SAME DISK_ONLY checkpoint the
      // real join uses and nothing else resident: where does the
      // heap-constrained run actually spend its time?
      def t[T](name: String)(body: => T): T = {
        val t0 = System.nanoTime(); val r = body
        println(f"[bottomk] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val k = 16; val dfCap = 64; val tThr = 0.8
      def kEffOf(sz: org.apache.spark.sql.Column) = least(sz, lit(k))
      def bkAlpha(sz: org.apache.spark.sql.Column) =
        ceil((lit(tThr) - lit(0.3)) * kEffOf(sz) - lit(1e-9))
      val bkSets = t("sets checkpoint (DISK_ONLY)")(
        Dedup.hashedShingleSets(docs).filter(col("sz") > 0)
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY))
      val probes = bkSets.select(col("doc_id").as("i"),
        explode(slice(col("shh"), lit(1),
          (kEffOf(col("sz")) - bkAlpha(col("sz")) + 1).cast("int"))).as("h"))
      val posting = Dedup.hashedPosting(bkSets).select(col("doc_id").as("j"), col("h"))
      val hubs = posting.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap).select("h")
      t("hub blacklist agg")(println(s"[bottomk] n_hubs=${hubs.count()}"))
      val postingCapped = posting.join(broadcast(hubs), Seq("h"), "left_anti")
      val cands = t("cands (anti + hash probe join + distinct)")(
        probes.hint("shuffle_hash").join(postingCapped, Seq("h"))
          .filter(col("i") =!= col("j")).select("i", "j").distinct()
          .localCheckpoint())
      println(s"[bottomk] n_cands=${cands.count()}")
      val candIds = cands.select(col("i").as("doc_id"))
        .union(cands.select(col("j").as("doc_id"))).distinct()
      val candSets = bkSets.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      val bkHits = graft.functions.ShingleHashFunctions.sortedIntersectCount(
        slice(col("shh_i"), lit(1), kEffOf(col("sz_i")).cast("int")), col("shh_j"))
      val inter = graft.functions.ShingleHashFunctions
        .sortedIntersectCount(col("shh_i"), col("shh_j"))
      t("rescore join (id-pruned)")(cands
        .join(candSets.select(col("doc_id").as("i"), col("shh").as("shh_i"),
          col("sz").as("sz_i")), "i")
        .join(candSets.select(col("doc_id").as("j"), col("shh").as("shh_j")), "j")
        .filter(bkHits >= bkAlpha(col("sz_i")))
        .withColumn("containment", inter * lit(1.0) / col("sz_i"))
        .filter(col("containment") >= tThr)
        .select("i", "j", "containment")
        .write.format("noop").mode("overwrite").save())
    } else if (mode == "buckets") {
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
