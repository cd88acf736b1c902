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
      "the customer joined the stream", // long merges incl. len-8 piece
      "window FILTER Column vectorized", // case folding + piece prefixes
      "a", "zz qq customercustomer", // single chars, back-to-back merges
      "datadatadata sparkspark", // repeated merges, no separators
      "42 rows; 3.14 * x_y!", // digits runs + symbols only
      "", "   ", "\t\n", // empty and whitespace-only
      "unmergeable xylophones", // mostly fallback singles
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
    // "customer" is a learned piece; greedy must emit it whole, not
    // "cust"+"om"+... ; "custox" falls back to "custo"+"x"
    assert(refEncode("customer") === Seq("customer"))
    assert(refEncode("custox") === Seq("custo", "x"))
    val Seq((n1, m1, _)) = sparkCounts(Seq("customer"))
    assert(n1 === 1L && m1 === 1L)
    val Seq((n2, _, _)) = sparkCounts(Seq("custox"))
    assert(n2 === 2L)
  }

  test("the shipped merges table IS what the trainer learns from the corpus") {
    // provenance pin: Sennrich training on the sf0.01 documents with the
    // documented stop rule (max 200 merges, min pair frequency 20) must
    // reproduce the piecesByLen literal exactly — the vocabulary is
    // learned, not invented, and re-derivable from the repo alone
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val merges = Bpe.learnMerges(docs, maxMerges = 200, minFreq = 20L)
    val learnedPieces = merges.map { case (a, b) => a + b }.toSet
    val shipped = Bpe.piecesByLen.flatMap(_._2).toSet
    assert(learnedPieces === shipped)
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
