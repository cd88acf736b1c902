package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the native kernels against reference formulations,
  * over adversarial random inputs (fixed seeds — no scalatest-scalacheck
  * bridge in the offline dependency set, same convention as
  * TransformPropertySpec).
  */
class KernelPropertySpec extends SparkSpec {

  /** Space-heavy strings over a mixed ascii/multibyte alphabet, biased
    * toward the edge shapes: leading/trailing/consecutive spaces, empties.
    */
  private val genText: Gen[String] = {
    val token = Gen.oneOf("a", "bb", "ccc", "é", "嗨", "x1", "")
    for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, token)
      sep <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  "))
    } yield toks.zipAll(sep, "", "").map { case (t, s) => t + s }.mkString
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("WordShingles equals the HOF formulation on random space-heavy strings") {
    import spark.implicits._
    val texts = samples(genText, 300).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hof = graft.dedup.Dedup.shingles(split(col("text"), " "))
    TextFunctions.ensureRegistered(spark)
    val native = coalesce(TextFunctions.wordShingles(col("text"), 3),
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
    val diff = df.select(col("doc_id"),
        array_sort(native).as("n"), array_sort(hof).as("h"))
      .filter(col("n") =!= col("h"))
    assert(diff.count() === 0)
  }

  test("WordShingleHashes equals sorted-distinct xxhash64 over the string kernel") {
    import spark.implicits._
    val texts = samples(genText, 300).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    TextFunctions.ensureRegistered(spark)
    ShingleHashFunctions.ensureRegistered(spark)
    val viaStrings = array_sort(array_distinct(
      transform(TextFunctions.wordShingles(col("text"), 3), s => xxhash64(s))))
    val native = ShingleHashFunctions.wordShingleHashes(col("text"), 3)
    val diff = df.select(viaStrings.as("ref"), native.as("n"))
      .filter(col("ref") =!= col("n"))
    assert(diff.count() === 0)
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val genArr: Gen[Seq[Long]] =
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted.toSeq))
    val pairs = samples(Gen.zip(genArr, genArr), 250)
    val df = pairs.toDF("a", "b")
    ShingleHashFunctions.ensureRegistered(spark)
    val diff = df.select(
        size(array_intersect(col("a"), col("b"))).as("ref"),
        ShingleHashFunctions.sortedIntersectCount(col("a"), col("b")).as("n"))
      .filter(col("ref") =!= col("n"))
    assert(diff.count() === 0)
  }

  test("RepetitionStats equals a plain-Scala count over random token lists") {
    import spark.implicits._
    val genToks: Gen[Seq[String]] =
      Gen.chooseNum(0, 25).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "bb", "é", "嗨", "x1")).map(_.toSeq))
    val lists = samples(genToks, 300)
    TextFunctions.ensureRegistered(spark)
    val rows = lists.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
      .select(col("id"), TextFunctions.repetitionStats(col("toks")).as("st"))
      .collect().map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    lists.zipWithIndex.foreach { case (toks, i) =>
      val st = rows(i.toLong)
      if (toks.isEmpty) assert(st.isEmpty, s"empty list $i must be null")
      else {
        val s = st.get
        val uni = toks.groupBy(identity).view.mapValues(_.size.toLong)
        assert(s.getLong(0) === toks.size.toLong, s"n_tokens for $i")
        assert(s.getLong(1) === uni.values.max, s"top_uni for $i")
        assert(s.getLong(2) === uni.values.count(_ == 1L).toLong, s"n_hapax for $i")
        if (toks.size < 2) assert(s.isNullAt(3) && s.isNullAt(4), s"bigram nulls for $i")
        else {
          val big = toks.sliding(2).toSeq.groupBy(identity).view.mapValues(_.size.toLong)
          assert(s.getLong(3) === toks.size.toLong - 1, s"n_bigrams for $i")
          assert(s.getLong(4) === big.values.max, s"top_big for $i")
        }
      }
    }
  }

  test("BpeCounts equals a regex + greedy-match reference on adversarial text") {
    import spark.implicits._
    // mixed words/digits/symbols/multibyte/odd whitespace (NBSP is NOT
    // Java \s, so it must count as a symbol token)
    val genDoc: Gen[String] = {
      val piece = Gen.oneOf("customer", "filter", "spark", "que", "ry", "zz",
        "a", "42", "3", ",", "é", "嗨", " ", " ", "  ", "\t", "\n", "")
      Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, piece).map(_.mkString))
    }
    def ref(text: String): (Long, Long, Long) = {
      val lowered = text.toLowerCase
      val words = "[a-z]+".r.findAllIn(lowered).toSeq
      val byLen = graft.text.Bpe.piecesByLen.map { case (l, ps) => l -> ps.toSet }
      var nBpe = 0L; var nMerged = 0L
      words.foreach { w =>
        var i = 0
        while (i < w.length) {
          byLen.find { case (l, ps) =>
            i + l <= w.length && ps.contains(w.substring(i, i + l))
          } match {
            case Some((l, _)) => nBpe += 1; nMerged += 1; i += l
            case None => nBpe += 1; i += 1
          }
        }
      }
      val nOther = "[0-9]+|[^a-z0-9\\s]".r.findAllIn(lowered).size.toLong
      (nBpe, nMerged, nOther)
    }
    val texts = samples(genDoc, 300)
    BpeFunctions.ensureRegistered(spark)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), BpeFunctions.bpeCounts(col("text")).as("st"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (b, m, o) = ref(t)
      val s = rows(i.toLong)
      assert((s.getLong(0), s.getLong(1), s.getLong(2)) === ((b, m, o)),
        s"counts for ${t.map(c => f"\\u$c%04x").mkString}")
    }
  }

  test("ByteStride equals the per-element reference on random payloads") {
    val genBytes: Gen[Array[Byte]] =
      Gen.chooseNum(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    samples(genBytes, 200).foreach { bytes =>
      for (k <- Seq(1, 2, 4, 7)) {
        val expected = bytes.zipWithIndex.collect { case (b, i) if i % k == 0 => b }
        assert(ByteStride.compute(bytes, k).toSeq === expected.toSeq,
          s"stride $k over ${bytes.length} bytes")
      }
    }
  }
}
