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
  *    fallback — pieces are ≤ 8 ASCII letters, so a piece packs into one
  *    long and each probe is one hash lookup instead of a set scan;
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

  /** Piece lengths probed longest-first; parallel array of piece sets with
    * each ≤8-letter piece packed big-endian into a long (first char in the
    * highest occupied byte) — same packing the scan produces.
    */
  private val lens: Array[Int] = graft.text.Bpe.piecesByLen.map(_._1).toArray
  private val sets: Array[java.util.HashSet[java.lang.Long]] =
    graft.text.Bpe.piecesByLen.map { case (_, pieces) =>
      val s = new java.util.HashSet[java.lang.Long](pieces.size * 2)
      pieces.foreach { p =>
        var v = 0L
        p.foreach(c => v = (v << 8) | (c.toLong & 0xFF))
        s.add(java.lang.Long.valueOf(v))
      }
      s
    }.toArray

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
          // next up-to-8 bytes packed so the first l of them are the low
          // l bytes after >>> (8-l)*8 — one long per position, one hash
          // probe per candidate length
          val lim = if (e - p < 8) e - p else 8
          var v = 0L
          var j = 0
          while (j < lim) { v = (v << 8) | (b(p + j) & 0xFFL); j += 1 }
          v <<= (8 - lim) * 8
          var matched = 0
          var k = 0
          while (matched == 0 && k < lens.length) {
            val l = lens(k)
            if (l <= e - p &&
              sets(k).contains(java.lang.Long.valueOf(v >>> ((8 - l) * 8))))
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
