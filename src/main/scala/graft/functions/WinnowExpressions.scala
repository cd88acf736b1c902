package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * public algorithm): hash every byte k-gram with a Rabin-Karp rolling
  * hash, then keep the minimum hash of each window of w consecutive grams
  * (rightmost minimum on ties), recording each selection once. Guarantees:
  * at least one fingerprint per w-window, and any two documents sharing a
  * substring of ≥ w + k - 1 bytes share at least one fingerprint — the
  * copy-detection property the brief's "rolling hash fingerprinting" is
  * for. One compiled pass with a simple per-window scan (w stays small),
  * same native-kernel pattern as VecDot / WordShingles / ByteStride. Not
  * SQL-expressible → the gate query is rows-only; parity with a naive
  * reference implementation and the winnowing guarantees are pinned in
  * WinnowSpec.
  */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1 && w >= 1, "gram size and window must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_winnow expects a string input, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    Winnow.compute(t.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object Winnow {

  /** Rabin-Karp base; odd so multiplication stays a bijection mod 2^64. */
  val base = 1000003L
  private def pow(b: Long, e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r *= b; i += 1 }
    r
  }

  /** Selected fingerprint hashes in selection order (each window position's
    * rightmost-minimum gram hash, deduplicated by gram position).
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1 // number of k-grams
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // rolling k-gram hashes (mod 2^64 arithmetic; mix to spread low bytes)
    val hs = new Array[Long](n)
    val top = pow(base, k - 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * base + (bytes(i) & 0xFF); i += 1 }
    hs(0) = mix(h)
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xFF) * top) * base + (bytes(i + k - 1) & 0xFF)
      hs(i) = mix(h)
      i += 1
    }
    if (n <= w) {
      // single partial window: one fingerprint (rightmost minimum)
      var best = 0
      var j = 1
      while (j < n) { if (hs(j) <= hs(best)) best = j; j += 1 }
      return new GenericArrayData(Array[Any](hs(best)))
    }
    val out = new java.util.ArrayList[Any](n / w + 4)
    var lastPick = -1
    var win = 0
    while (win <= n - w) {
      var best = win
      var j = win + 1
      while (j < win + w) { if (hs(j) <= hs(best)) best = j; j += 1 }
      if (best != lastPick) { out.add(hs(best)); lastPick = best }
      win += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** splitmix-style finalizer: rolling hashes of short grams concentrate in
    * low entropy without it.
    */
  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Session registration, same contract as [[VectorFunctions]]. */
object WinnowFunctions {

  val winnowName = "graft_winnow"

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      winnowName,
      exprs => Winnow(exprs.head,
        Args.intLiteral(winnowName, exprs, 1), Args.intLiteral(winnowName, exprs, 2)),
      "built-in")

  def winnow(text: Column, k: Int, w: Int): Column =
    call_function(winnowName, text, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))
}
