package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextAnalysis
import graft.util.Tables

class CurationSpec extends SparkSpec {

  test("sequence packing matches an independent Scala re-derivation") {
    val budget = 256
    val toks = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // reference packing: sequential scan per source in doc_id order
    val expected = toks.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      var before = 0L
      rows.sortBy(_._1).map { case (id, _, n) =>
        val pack = before / budget
        before += n
        ((src, pack), (id, n))
      }
    }.groupBy(_._1).map { case ((src, pack), xs) =>
      val ds = xs.map(_._2)
      (src, pack) -> (ds.size.toLong, ds.map(_._2).sum, ds.map(_._1).min, ds.map(_._1).max)
    }
    val got = graft.SparkEntry.queries("q_pack_sequences")(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got === expected)
    // conservation: every token lands in exactly one pack
    assert(got.values.map(_._2).sum === toks.map(_._3).sum)
    // pack ids are dense from 0 within each source
    got.keys.groupBy(_._1).foreach { case (src, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids === (0L until ids.size).toSeq, s"non-dense packs for $src")
    }
  }
}
