package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenizer accounting (kernel 12) — the compiled twin of
  * [[graft.text.Bpe]]'s expression fold. The expression form re-evaluated
  * an interpreted six-way `array_contains(substr)` probe chain per
  * character, and Catalyst cannot CSE the per-word codes through lambda
  * bodies, so every counting column re-derived them from scratch.
  * Tokenization is a training-data pipeline's innermost loop: at 100 TB it
  * must run at scan speed as a row-local compiled pass, which is exactly
  * how production tokenizers (HF tokenizers, SentencePiece) are built.
  *
  * Bit-identical semantics to the DuckDB mirror:
  *  - words are `[a-z]+` runs of `lower(text)` (UTF8String.toLowerCase IS
  *    Spark's `lower`, as in [[LangIdHits]]);
  *  - each word encodes by MERGE-PRIORITY REPLAY (round 16, retiring the
  *    maximal-munch approximation): repeatedly merge the adjacent symbol
  *    pair with the LOWEST merge rank, leftmost occurrence first, until no
  *    learned pair remains. This is exactly what applying the trainer's
  *    merge list in order does — a merge can only create pairs of HIGHER
  *    rank than itself (pair (x, ab) could only be learned after ab
  *    existed, i.e. after merge (a, b)), so the rank-ordered fixpoint and
  *    the sequential replay coincide; it is also how subword-nmt's
  *    apply_bpe and HF tokenizers encode, and it diverges from maximal
  *    munch on boundary-crossing sequences (munch grabs the longest PIECE
  *    even when no merge chain reaches it — e.g. pieces {ab, abc(=a+bc)}:
  *    "abcd" munches abc|d but tokenizes ab|c|d, because rank(a,b) <
  *    rank(b,c) consumes the b first). BpeSpec pins the kernel
  *    token-for-token against sequential trainer application. Pair-rank
  *    lookups are boxing-free: the pair's CONCAT is a contiguous span of
  *    the word, packed left-aligned into two longs (pieces ≤ 16 ASCII
  *    letters), keyed with the split position in an open-addressing table;
  *    per-pair ranks are cached along the word and only the two pairs
  *    adjacent to a merge recompute;
  *  - "other" tokens are digit runs plus every single non-[a-z0-9\s]
  *    code point, with `\s` being RE2's whitespace class [ \t\n\f\r] —
  *    the oracle's regex engine; vertical tab counts as a symbol (Java's
  *    `\s` would swallow it, silently diverging the engines) — a leading
  *    UTF-8 byte identifies one code point, so the byte scan counts
  *    exactly what the regex alternation matched.
  */
case class BpeCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_counts expects a string input, got $other")
  }

  override def dataType: DataType = BpeCounts.outType

  override def nullSafeEval(t: Any): Any =
    BpeCounts.compute(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_counts"
}

object BpeCounts {

  val outType: StructType = StructType(Seq(
    StructField("n_bpe", LongType, nullable = false),
    StructField("n_merged", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false)))

  /** Open-addressing map from merge pairs to their rank: the key is the
    * pair's CONCATENATION packed big-endian LEFT-ALIGNED into (hi, lo) —
    * bytes 0..7 into the top of `hi`, 8..15 into the top of `lo`,
    * zero-padded (the first byte is always ≥ 'a', so hi == 0 marks an
    * empty slot, and zero-padding is unambiguous across lengths) — PLUS
    * the split position, because two different merges can produce the same
    * piece (a+bc and ab+c both make abc). Lookup is three array reads per
    * linear-probe step — no boxing, no string building (the concat of two
    * ADJACENT symbols is a contiguous span of the word's bytes).
    */
  private object Ranks {
    private val merges = graft.text.Bpe.merges
    private val cap = Integer.highestOneBit(math.max(16, merges.size * 4) - 1) << 1
    private val msk = cap - 1
    private val his = new Array[Long](cap)
    private val los = new Array[Long](cap)
    private val sps = new Array[Int](cap)
    private val rks = new Array[Int](cap)
    private def slot(hi: Long, lo: Long, sp: Int): Int = {
      var z = hi * 0x9E3779B97F4A7C15L ^ lo * 0xC2B2AE3D27D4EB4FL ^
        sp.toLong * 0xD6E8FEB86659FD93L
      z = (z ^ (z >>> 29)) * 0xBF58476D1CE4E5B9L
      ((z ^ (z >>> 32)) & msk).toInt
    }
    locally {
      var r = 0
      merges.foreach { case (a, bb) =>
        val p = a + bb
        require(p.length <= 16 && p.forall(c => c >= 'a' && c <= 'z'),
          s"merge pair '$a $bb' breaks the kernel's 16-ASCII-letter packing bound")
        var hi = 0L; var lo = 0L
        var j = 0
        while (j < p.length) {
          val bv = p.charAt(j).toLong & 0xFFL
          if (j < 8) hi |= bv << ((7 - j) * 8) else lo |= bv << ((15 - j) * 8)
          j += 1
        }
        var s = slot(hi, lo, a.length)
        while (his(s) != 0L &&
          !(his(s) == hi && los(s) == lo && sps(s) == a.length)) s = (s + 1) & msk
        if (his(s) == 0L) { // a duplicate pair keeps its FIRST (lowest) rank
          his(s) = hi; los(s) = lo; sps(s) = a.length; rks(s) = r
        }
        r += 1
      }
    }
    /** Rank of the pair spanning b[off, off+tot) split at `sp` letters;
      * Int.MaxValue when the pair is not a learned merge.
      */
    def rankOf(b: Array[Byte], off: Int, tot: Int, sp: Int): Int = {
      if (tot > 16) return Int.MaxValue
      var hi = 0L; var lo = 0L
      var j = 0
      while (j < tot) {
        val bv = b(off + j) & 0xFFL
        if (j < 8) hi |= bv << ((7 - j) * 8) else lo |= bv << ((15 - j) * 8)
        j += 1
      }
      var s = slot(hi, lo, sp)
      while (his(s) != 0L) {
        if (his(s) == hi && los(s) == lo && sps(s) == sp) return rks(s)
        s = (s + 1) & msk
      }
      Int.MaxValue
    }
  }

  /** Merge-priority replay over one [a-z]+ run b[start, end): fills
    * `starts` (caller-sized ≥ len+1) with the final token boundaries and
    * returns the token count m (boundaries starts(0..m), starts(m) = end).
    * `prk` (caller-sized ≥ len) caches per-pair ranks so each merge
    * recomputes only its two neighbors; the min-scan per merge is O(m).
    */
  private[graft] def encodeWord(b: Array[Byte], start: Int, end: Int,
      starts: Array[Int], prk: Array[Int]): Int = {
    val n = end - start
    var m = n
    var i = 0
    while (i <= n) { starts(i) = start + i; i += 1 }
    if (m < 2) return m
    def rank(i: Int): Int =
      Ranks.rankOf(b, starts(i), starts(i + 2) - starts(i),
        starts(i + 1) - starts(i))
    i = 0
    while (i < m - 1) { prk(i) = rank(i); i += 1 }
    var done = false
    while (!done) {
      var best = -1
      var bestR = Int.MaxValue
      var k = 0
      while (k < m - 1) {
        if (prk(k) < bestR) { bestR = prk(k); best = k }
        k += 1
      }
      if (best < 0) done = true
      else {
        // merge symbols best and best+1: drop boundary starts(best+1);
        // pairs past the merge keep their ranks, the two pairs touching
        // the new symbol recompute
        System.arraycopy(starts, best + 2, starts, best + 1, m - best - 1)
        if (m - best - 3 > 0)
          System.arraycopy(prk, best + 2, prk, best + 1, m - best - 3)
        m -= 1
        if (best > 0) prk(best - 1) = rank(best - 1)
        if (best < m - 1) prk(best) = rank(best)
      }
    }
    m
  }

  /** Test-visible token sequence for one lowercase word — the same replay
    * core [[encodeWord]] runs in the counting scan, surfaced for BpeSpec's
    * token-for-token parity pin against sequential trainer application.
    */
  private[graft] def encodeTokens(word: String): Seq[String] = {
    val b = word.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val starts = new Array[Int](b.length + 1)
    val prk = new Array[Int](math.max(1, b.length))
    val m = encodeWord(b, 0, b.length, starts, prk)
    (0 until m).map(i => word.substring(starts(i), starts(i + 1)))
  }

  def compute(text: UTF8String): InternalRow = {
    val b = text.toLowerCase.getBytes
    val n = b.length
    var nBpe = 0L; var nMerged = 0L; var nOther = 0L
    // per-row replay buffers, grown to the longest letter run encountered
    var starts = new Array[Int](65)
    var prk = new Array[Int](64)
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') {
        var e = i
        while (e < n && b(e) >= 'a' && b(e) <= 'z') e += 1
        if (e - i + 1 > starts.length) {
          starts = new Array[Int](e - i + 1)
          prk = new Array[Int](e - i)
        }
        val m = encodeWord(b, i, e, starts, prk)
        nBpe += m
        var t = 0
        while (t < m) {
          if (starts(t + 1) - starts(t) > 1) nMerged += 1
          t += 1
        }
        i = e
      } else if (c >= '0' && c <= '9') {
        while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
        nOther += 1
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') {
        // RE2's \s set (the oracle's regex engine) — Java's \s would also
        // skip \x0B, but RE2 counts VT as a symbol, and the oracle wins
        i += 1
      } else {
        // one "other" token per non-word non-digit non-\s code point; a
        // UTF-8 continuation byte is not a code point
        if ((c & 0xC0) != 0x80) nOther += 1
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nBpe, nMerged, nOther))
  }
}

/** Total tokenizer output length (n_bpe + n_other) in ONE kernel pass.
  * Summing two getFields off separate [[BpeCounts]] references runs the
  * tokenizer twice per row wherever Catalyst's subexpression elimination
  * doesn't fire (interpreted eval, some filter contexts); this variant
  * evaluates the scan once and adds the two counters in place.
  */
case class BpeTotal(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_total expects a string input, got $other")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    BpeTotal.compute(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeTotal.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeTotal =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_total"
}

object BpeTotal {
  def compute(text: UTF8String): Long = {
    val r = BpeCounts.compute(text)
    r.getLong(0) + r.getLong(2)
  }
}

/** Session registration, same contract as [[VectorFunctions]]. */
object BpeFunctions {

  val countsName = "graft_bpe_counts"
  val totalName = "graft_bpe_total"

  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      countsName, exprs => BpeCounts(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      totalName, exprs => BpeTotal(exprs.head), "built-in")
  }

  def bpeCounts(text: Column): Column = call_function(countsName, text)

  def bpeTotal(text: Column): Column = call_function(totalName, text)
}
