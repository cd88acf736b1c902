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
  * Bit-identical semantics to the fold and its DuckDB mirror:
  *  - words are `[a-z]+` runs of `lower(text)` (UTF8String.toLowerCase IS
  *    Spark's `lower`, as in [[LangIdHits]]);
  *  - each word encodes by greedy longest-match (maximal munch) against
  *    the learned piece set, longest pieces probed first, single-character
  *    fallback — each piece (≤ 16 ASCII letters since the round-15 8192-
  *    merge vocabulary; the 89-merge table fit 8) packs left-aligned into
  *    two longs, and each probe is one boxing-free open-addressing lookup
  *    against masked prefixes of the position's 16-byte window;
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

  /** Open-addressing set of (hi, lo) piece keys: a piece of l ≤ 16 ASCII
    * letters packs big-endian LEFT-ALIGNED — bytes 0..7 into the top of
    * `hi`, bytes 8..15 into the top of `lo`, zero-padded. The first byte
    * is always ≥ 'a', so hi == 0 marks an empty slot, and zero-padding is
    * unambiguous across lengths (no letter is 0x00). Probing is two array
    * reads per linear-probe step — no boxing, no per-length HashSet.
    */
  private final class PieceSet(pieces: Seq[String]) {
    private val cap = Integer.highestOneBit(math.max(16, pieces.size * 4) - 1) << 1
    private val msk = cap - 1
    private val his = new Array[Long](cap)
    private val los = new Array[Long](cap)
    private def slot(hi: Long, lo: Long): Int = {
      var z = hi * 0x9E3779B97F4A7C15L ^ lo * 0xC2B2AE3D27D4EB4FL
      z = (z ^ (z >>> 29)) * 0xBF58476D1CE4E5B9L
      ((z ^ (z >>> 32)) & msk).toInt
    }
    pieces.foreach { p =>
      var hi = 0L; var lo = 0L
      var j = 0
      while (j < p.length) {
        val bv = p.charAt(j).toLong & 0xFFL
        if (j < 8) hi |= bv << ((7 - j) * 8) else lo |= bv << ((15 - j) * 8)
        j += 1
      }
      var s = slot(hi, lo)
      while (his(s) != 0L && !(his(s) == hi && los(s) == lo)) s = (s + 1) & msk
      his(s) = hi; los(s) = lo
    }
    def contains(hi: Long, lo: Long): Boolean = {
      var s = slot(hi, lo)
      while (his(s) != 0L) {
        if (his(s) == hi && los(s) == lo) return true
        s = (s + 1) & msk
      }
      false
    }
  }

  /** Piece lengths present in the vocabulary, probed longest-first. */
  private val lens: Array[Int] = graft.text.Bpe.piecesByLen.map(_._1).toArray
  private val pieceSet: PieceSet =
    new PieceSet(graft.text.Bpe.piecesByLen.flatMap(_._2))
  // maskTop(k) keeps the top k bytes of a long (k in 0..8)
  private val maskTop: Array[Long] =
    Array.tabulate(9)(k => if (k == 0) 0L else -1L << ((8 - k) * 8))

  def compute(text: UTF8String): InternalRow = {
    val b = text.toLowerCase.getBytes
    val n = b.length
    var nBpe = 0L; var nMerged = 0L; var nOther = 0L
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') {
        var e = i
        while (e < n && b(e) >= 'a' && b(e) <= 'z') e += 1
        var p = i
        while (p < e) {
          // pack the next up-to-16 bytes left-aligned into (hi, lo) once;
          // each candidate length probes a masked prefix of that window
          val lim = if (e - p < 16) e - p else 16
          var hi = 0L; var lo = 0L
          var j = 0
          while (j < lim) {
            val bv = b(p + j) & 0xFFL
            if (j < 8) hi |= bv << ((7 - j) * 8) else lo |= bv << ((15 - j) * 8)
            j += 1
          }
          var matched = 0
          var k = 0
          while (matched == 0 && k < lens.length) {
            val l = lens(k)
            if (l <= e - p && (
              if (l <= 8) pieceSet.contains(hi & maskTop(l), 0L)
              else pieceSet.contains(hi, lo & maskTop(l - 8))))
              matched = l
            k += 1
          }
          nBpe += 1
          if (matched > 0) { nMerged += 1; p += matched } else p += 1
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
