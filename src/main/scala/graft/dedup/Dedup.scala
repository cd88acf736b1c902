package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextAnalysis
import graft.util.{Q, Tables}

/** Near/exact deduplication family for a training-data pipeline
  * (BASELINE.json north star). The scale-critical design choices:
  *
  *  - Shingle sets live as per-row arrays (documents are KB-scale, so an
  *    array column beats a posting-table when the pair set is what's big).
  *  - The exact set-similarity join uses PREFIX FILTERING (PPJoin-style):
  *    with shingles in a global (frequency, value) order, two sets with
  *    Jaccard ≥ t MUST share a token in their first |A|-⌈t·|A|⌉+1 tokens —
  *    so the candidate join touches only prefix postings, not every shingle.
  *    Exact recall (theorem-backed), no brute-force n² anywhere.
  *  - MinHash-LSH and SimHash are the probabilistic scale paths (constant
  *    per-doc signature cost, banded equi-join candidates, exact rescore);
  *    not SQL-expressible → rows-only checks, pinned instead by DedupSpec
  *    against the exact join's output.
  */
object Dedup {

  // -------------------------------------------------------------- shingles

  /** Word 3-shingles as a distinct array (single-space split to match the
    * oracle's string_split; element_at is 1-based on both engines).
    */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i =>
          concat_ws(" ",
            element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  private val shinglesSql =
    """list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
            || ' ' || string_split(text, ' ')[i+2]))"""

  /** Shingle sets per doc: (doc_id, sh, sz), empty sets dropped. */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)

  /** Exact jaccard re-score of candidate (i, j) pairs given both arrays. */
  private def rescore(cands: DataFrame, sets: DataFrame, t: Double): DataFrame = {
    val inter = size(array_intersect(col("sh_i"), col("sh_j")))
    cands
      .join(sets.select(col("doc_id").as("i"), col("sh").as("sh_i"), col("sz").as("sz_i")), "i")
      .join(sets.select(col("doc_id").as("j"), col("sh").as("sh_j"), col("sz").as("sz_j")), "j")
      .withColumn("jaccard",
        inter * lit(1.0) / (col("sz_i") + col("sz_j") - inter))
      .filter(col("jaccard") >= t)
      .select("i", "j", "jaccard")
  }

  // ------------------------------------------------------- exact SSJ (oracle)

  /** Exact all-pairs Jaccard join with prefix filtering. */
  def setSimilarityJoin(docs: DataFrame, t: Double): DataFrame = {
    val sets = shingleSets(docs)
    val posting = sets.select(col("doc_id"), col("sz"), explode(col("sh")).as("shingle"))
    val freq = posting.groupBy("shingle").agg(count(lit(1)).as("freq"))
    // Global total order: rare shingles first → prefixes are the most
    // selective tokens → smallest candidate fan-out.
    val ranked = posting
      .join(freq, "shingle")
      .withColumn("rank",
        row_number().over(Window.partitionBy("doc_id").orderBy(col("freq"), col("shingle"))))
    val prefix = ranked
      .filter(col("rank") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select(col("shingle"), col("doc_id"))
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    rescore(cands, sets, t)
  }

  val q_dedup_ngram_jaccard: Q = Q(
    "q_dedup_ngram_jaccard",
    Some(s"""
      WITH s AS (
        SELECT doc_id, $shinglesSql AS sh FROM documents
      ), sz AS (
        SELECT doc_id, sh, len(sh) AS sz FROM s WHERE len(sh) > 0
      )
      SELECT a.doc_id AS i, b.doc_id AS j,
             len(list_intersect(a.sh, b.sh)) * 1.0
               / (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM sz a JOIN sz b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) * 1.0
              / (a.sz + b.sz - len(list_intersect(a.sh, b.sh))) >= 0.5
      ORDER BY i, j
    """),
  ) { (s, d) =>
    setSimilarityJoin(Tables.documents(s, d), 0.5).orderBy("i", "j")
  }

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup by normalized-content hash: canonical = min doc_id. */
  val q_dedup_exact: Q = Q(
    "q_dedup_exact",
    Some("""
      SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                 ' +', ' ', 'g'))) AS fingerprint,
             MIN(doc_id) AS canonical_id,
             COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY canonical_id
    """),
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(TextAnalysis.normalize(col("text")).cast(BinaryType)).as("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("canonical_id")
  }

  // ------------------------------------------------------------ minhash LSH

  val numHashes = 64
  val numBands  = 16
  val rowsPerBand: Int = numHashes / numBands

  /** MinHash signature as one narrow projection: hash each shingle once
    * (xxhash64), then k array-min passes, each re-mixing with the hash index
    * as seed material (avoids a*x+b modular arithmetic, which trips ANSI
    * overflow checking) — no shuffle, no UDF.
    */
  def withSignature(sets: DataFrame): DataFrame =
    sets
      .withColumn("hs", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sig", array((0 until numHashes).map { i =>
        array_min(transform(col("hs"), h => xxhash64(h, lit(i))))
      }: _*))
      .drop("hs")

  /** LSH banding: 16 bands × 4 rows. Docs sharing any band hash become
    * candidates (pair probability ~1-(1-j⁴)¹⁶: >0.99 at j=0.7); candidates
    * are exact-rescored so precision is 1, recall is the LSH curve.
    */
  def minHashLshJoin(docs: DataFrame, t: Double): DataFrame = {
    val sets = shingleSets(docs)
    val banded = withSignature(sets)
      .select(col("doc_id"),
        posexplode(array((0 until numBands).map { j =>
          xxhash64(lit(j), slice(col("sig"), j * rowsPerBand + 1, rowsPerBand))
        }: _*)).as(Seq("band", "band_hash")))
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    rescore(cands, sets, t)
  }

  /** Rows-only: banding hashes aren't SQL-expressible; recall pinned against
    * the exact join in DedupSpec.
    */
  val q_dedup_minhash_lsh: Q = Q("q_dedup_minhash_lsh", None) { (s, d) =>
    minHashLshJoin(Tables.documents(s, d), 0.5).orderBy("i", "j")
  }

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash: majority vote per bit over shingle hashes. 64
    * aggregate expressions over the hashed-shingle array — one projection,
    * no shuffle.
    */
  def withSimHash(sets: DataFrame): DataFrame = {
    val votes = (0 until 64).map { b =>
      aggregate(col("hs"), lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1))
    }
    val simhash = votes.zipWithIndex
      .map { case (v, b) => when(v > 0, lit(1L << b)).otherwise(0L) }
      .reduce(_.bitwiseOR(_))
    sets
      .withColumn("hs", transform(col("sh"), s => xxhash64(s)))
      .withColumn("simhash", simhash)
      .drop("hs")
  }

  /** Near-dup pairs with Hamming distance ≤ 3 via 4×16-bit band buckets
    * (pigeonhole: ≤3 differing bits leave ≥1 of 4 bands identical — exact
    * recall for the Hamming predicate), then popcount verify.
    */
  def simHashJoin(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val hashed = withSimHash(shingleSets(docs)).select(col("doc_id"), col("simhash"))
    val banded = hashed.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)
      }: _*)).as(Seq("chunk", "chunk_val")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  val q_dedup_simhash: Q = Q("q_dedup_simhash", None) { (s, d) =>
    simHashJoin(Tables.documents(s, d)).orderBy("i", "j")
  }

  def all: Seq[Q] =
    Seq(q_dedup_exact, q_dedup_ngram_jaccard, q_dedup_minhash_lsh, q_dedup_simhash)
}
