package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.io.Sources

/** Property-based invariants (SURVEY.md §5.3) over randomly generated raw
  * documents: the validation split partitions the input, dedup keeps exactly
  * the first occurrence per key, and derived enums are total. Generators
  * run under fixed seeds (no scalatest-scalacheck bridge in the offline
  * dependency set) so failures reproduce exactly.
  */
class TransformPropertySpec extends SparkSpec {

  private val genId: Gen[Option[String]] =
    Gen.option(Gen.chooseNum(1, 6).map(n => s"id$n"))
  private val genEpoch: Gen[Option[Long]] = Gen.option(Gen.oneOf(
    Gen.chooseNum(1600000000L, 1720000000L), Gen.const(0L),
    Gen.const(999999999999999L)).flatMap(g => g))
  private val genFormat: Gen[Option[String]] =
    Gen.option(Gen.oneOf("VIDEO", "IMAGE", "DCO", "CAROUSEL", "TEXT", "XR"))

  private val genAd: Gen[String] = for {
    id <- genId
    active <- Gen.option(Gen.oneOf(true, false))
    start <- genEpoch
    end <- genEpoch
    tat <- Gen.option(Gen.chooseNum(0L, 500000L))
    gid <- Gen.option(Gen.chooseNum(1, 4).map(n => s"g$n"))
    cnt <- Gen.option(Gen.chooseNum(0L, 9L))
    fmt <- genFormat
    text <- Gen.option(Gen.oneOf("the cat", "el perro grande", "x y z", ""))
    hasCard <- Gen.oneOf(true, false)
  } yield {
    def j(o: Option[_]): String = o match {
      case Some(s: String) => "\"" + s + "\""
      case Some(v) => v.toString
      case None => "null"
    }
    val card = if (hasCard)
      """, "cards": [{"body": "card body", "video_hd_url": "u", "original_image_url": ""}]"""
    else ""
    s"""{"ad_archive_id": ${j(id)}, "is_active": ${j(active)},
        "start_date": ${j(start)}, "end_date": ${j(end)},
        "total_active_time": ${j(tat)}, "collation_id": ${j(gid)},
        "collation_count": ${j(cnt)},
        "snapshot": {"display_format": ${j(fmt)},
                     "body": {"text": ${j(text)}}$card}}"""
  }

  private val genDoc: Gen[String] = for {
    groups <- Gen.listOfN(3, Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, genAd)))
  } yield groups.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  test("pipeline invariants hold over generated documents") {
    val docs = (1L to 8L).flatMap { i =>
      genDoc.apply(Gen.Parameters.default.withSize(20), Seed(i))
    }
    assert(docs.size === 8)
    docs.foreach { doc =>
      val raw = Sources.rawAdsFromStrings(spark, Seq(("p", doc)))
      val parsed = Transform.derive(Transform.flatten(raw)).cache()
      val (valid, quarantine) = Transform.validate(parsed)
      val deduped = Transform.dedup(valid)

      val nParsed = parsed.count()
      // split partitions the input
      assert(valid.count() + quarantine.count() === nParsed)
      // every parsed row has total derived enums
      val mixes = parsed.select("media_mix").distinct()
        .collect().map(_.getString(0)).toSet
      assert(mixes.subsetOf(Set("video-only", "image-only", "both", "none")))
      assert(parsed.filter("ad_lang_code IS NULL").count() === 0)

      // dedup: unique keys (nulls collapse like pandas NaN-equality)
      Seq("ad_id", "ad_group_id", "ad_text").foreach { k =>
        val dup = deduped.groupBy(k).count().filter("count > 1").count()
        assert(dup === 0, s"duplicate $k survived")
      }
      // keep-first: each surviving ad_id row is the first valid row in
      // (doc_id, group_idx, pos) order for that key
      val firsts = valid.orderBy("doc_id", "group_idx", "pos")
        .select("ad_id", "group_idx", "pos").collect()
        .groupBy(_.getString(0)).map { case (k, rows) =>
          k -> (rows.head.getInt(1), rows.head.getInt(2)) }
      val survivors = deduped.select("ad_id", "group_idx", "pos").collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
      survivors.foreach { case (k, pos) =>
        assert(firsts(k) === pos, s"survivor for $k is not the first occurrence")
      }
      parsed.unpersist()
    }
  }
}
