package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the subword encoder (the BpeCounts native kernel since round 9)
  * against a direct JVM greedy longest-match reference over the same
  * learned merge vocabulary.
  */
class BpeSpec extends SparkSpec {

  private val byLen: Seq[(Int, Set[String])] =
    Bpe.piecesByLen.map { case (l, ps) => l -> ps.toSet }

  /** Reference encoder: maximal munch, single chars as fallback. */
  private def refEncode(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val piece = byLen
        .collectFirst {
          case (l, ps) if i + l <= word.length && ps(word.substring(i, i + l)) =>
            word.substring(i, i + l)
        }
        .getOrElse(word.substring(i, i + 1))
      out += piece
      i += piece.length
    }
    out.result()
  }

  private def refCounts(text: String): (Long, Long, Long) = {
    val words = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
    val toks = words.flatMap(refEncode)
    val other = "[0-9]+|[^a-z0-9\\s]".r.findAllIn(text.toLowerCase).size
    (toks.size.toLong, toks.count(_.length > 1).toLong, other.toLong)
  }

  private def sparkCounts(texts: Seq[String]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Bpe.ensureRegistered(spark)
    texts.toDF("text")
      .select(Bpe.bpeCount(col("text")), Bpe.mergedCount(col("text")),
        Bpe.otherCount(col("text")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  test("expression fold matches the JVM reference on curated cases") {
    val cases = Seq(
      "the leszaskor joined the stream", // incl. a len-9 piece (two-long probe)
      "LESZASKOR MesPasMen vectorized", // case folding + piece prefixes
      "a", "zz qq leszaskorleszaskor", // single chars, back-to-back merges
      "banobanobano mesmes", // repeated merges, no separators
      "42 rows; 3.14 * x_y!", // digits runs + symbols only
      "", "   ", "\t\n", // empty and whitespace-only
      "unmergeable xylophones", // fallback-heavy
    )
    assert(sparkCounts(cases) === cases.map(refCounts))
  }

  test("expression fold matches the JVM reference on every sf0.001 document") {
    import spark.implicits._
    val texts = spark.read.parquet(sf() + "/documents.parquet")
      .select(coalesce(col("text"), lit("")))
      .as[String].collect().toSeq
    assert(sparkCounts(texts) === texts.map(refCounts))
  }

  test("maximal munch prefers the longest piece") {
    // "leszaskor" is a learned 9-letter piece whose prefixes "le"/"les"/
    // "leszas" are also pieces; greedy must emit it whole, and "leszasx"
    // falls back to "leszas"+"x"
    assert(refEncode("leszaskor") === Seq("leszaskor"))
    assert(refEncode("leszasx") === Seq("leszas", "x"))
    val Seq((n1, m1, _)) = sparkCounts(Seq("leszaskor"))
    assert(n1 === 1L && m1 === 1L)
    val Seq((n2, _, _)) = sparkCounts(Seq("leszasx"))
    assert(n2 === 2L)
  }

  test("incremental trainer equals the published reference trainer") {
    // equivalence pin: the O(affected)-per-merge incremental trainer and
    // the published full-recount loop produce the SAME merge sequence —
    // same counts, same (frequency desc, pair lexicographic) tie-break —
    // on the real sf0.01 corpus at a size the naive loop can afford
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val naive = Bpe.learnMerges(docs, maxMerges = 200, minFreq = 20L)
    val fast = BpeTrain.learnMergesFast(docs, maxMerges = 200, minFreq = 20L)
    assert(fast === naive)
  }

  test("the shipped 8192-merge resource IS what the trainer learns") {
    // provenance pin: the incremental trainer on the deterministic
    // synthetic corpus with the documented stop rule must reproduce the
    // bpe_merges.txt resource exactly, in merge order — the vocabulary is
    // learned, not invented, and re-derivable from the repo alone
    val merges = BpeTrain.learnMergesFast(
      BpeTrain.syntheticTrainingCorpus(spark),
      BpeTrain.shippedMaxMerges, BpeTrain.shippedMinFreq)
    assert(merges.size === 8192)
    assert(merges === Bpe.merges)
    // every piece fits the kernel's two-long packing bound
    assert(Bpe.piecesByLen.map(_._1).max <= 16)
  }

  test("pack budget consumes the tokenizer totals (count composition)") {
    val Seq((nb, _, no)) = sparkCounts(Seq("pack 2 streams: go!"))
    import spark.implicits._
    Bpe.ensureRegistered(spark)
    val total = Seq("pack 2 streams: go!").toDF("text")
      .select(Bpe.totalCount(col("text"))).as[Long].head()
    assert(total === nb + no)
  }
}
