package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class MultimodalSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("sniffed format always matches the declared magic header") {
    val media = Multimodal.mediaTable(docs)
    val mismatches = media
      .filter(Multimodal.sniffFormat(col("payload")) =!= col("declared_format"))
      .count()
    assert(mismatches === 0)
    val formats = media.select("declared_format").distinct()
      .collect().map(_.getString(0)).toSet
    assert(formats === Set("png", "jpeg", "wav"))
  }

  test("frames reassemble exactly into the original payload") {
    val media = Multimodal.mediaTable(docs.filter(col("doc_id") < 10))
    val reassembled = Multimodal.frames(media, frameSize = 7)
      .groupBy("media_id")
      .agg(concat_ws("",
        sort_array(collect_list(struct(col("frame_idx"), hex(col("frame")).as("h"))))
          .getField("h")).as("hex_joined"))
    val joined = media.select(col("media_id"), hex(col("payload")).as("hex_payload"))
      .join(reassembled, "media_id")
    assert(joined.filter(col("hex_joined") =!= col("hex_payload")).count() === 0)
    // every frame but the last is exactly frameSize bytes
    val shortMid = Multimodal.frames(media, 7)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("media_id")))
      .filter(col("frame_idx") < col("n") - 1 && length(col("frame")) =!= 7)
    assert(shortMid.count() === 0)
  }

  test("stub features have the declared batch shape and range") {
    val feats = Multimodal.frameFeatures(
      Multimodal.frames(Multimodal.mediaTable(docs.filter(col("doc_id") < 5)), 64), dim = 8)
    val rows = feats.select("feature").collect().map(_.getSeq[Double](0))
    assert(rows.nonEmpty)
    assert(rows.forall(_.length === 8))
    assert(rows.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
    // deterministic: same input → same vectors
    val again = Multimodal.frameFeatures(
      Multimodal.frames(Multimodal.mediaTable(docs.filter(col("doc_id") < 5)), 64), dim = 8)
      .select("feature").collect().map(_.getSeq[Double](0))
    assert(rows.toSeq === again.toSeq)
  }
}
