package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling kernel. The built-in formulation —
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * element_at(toks, i), ...)))` — evaluates three interpreted expressions
  * per gram position inside a higher-order lambda, plus a string-equality
  * distinct pass; measured at ~0.5 ms/document, it dominated every
  * shingle-based dedup query.
  *
  * [[WordShingles]] exploits that tokens come from a SINGLE-SPACE split:
  * the n-gram "w_i w_{i+1} ... w_{i+n-1}" joined by single spaces is
  * byte-identical to the input's span from the start of w_i to the end of
  * w_{i+n-1}. So one compiled pass finds the space positions and emits
  * deduplicated zero-copy-ish slices — semantically identical to the HOF
  * chain (split-with-empties, first-occurrence distinct) and to the DuckDB
  * oracle's string_split formulation, at scan speed.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_word_shingles expects a string input, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    WordShingles.compute(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_word_shingles"
}

object WordShingles {

  /** One pass: locate single-space token boundaries (split-with-empties
    * semantics, i.e. Java `split(" ", -1)`), slice each n-token span, and
    * keep first occurrences. A space byte (0x20) is never a UTF-8
    * continuation byte, so byte scanning is multibyte-safe.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token i spans [starts(i), ends(i)); tokens = spaces + 1
    var nTokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nTokens += 1; i += 1 }
    if (nTokens < n) return WordShingles.empty
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    starts(0) = 0
    var tok = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) {
        ends(tok) = i
        tok += 1
        starts(tok) = i + 1
      }
      i += 1
    }
    ends(tok) = len
    val seen = new java.util.LinkedHashSet[UTF8String](nTokens * 2)
    var g = 0
    while (g <= nTokens - n) {
      val from = starts(g)
      val until = ends(g + n - 1)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      g += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  private val empty = new GenericArrayData(Array.empty[Any])
}

/** Session registration, same contract as [[VectorFunctions]]. */
object TextFunctions {

  val shinglesName = "graft_word_shingles"

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      shinglesName,
      exprs => WordShingles(exprs.head, Args.intLiteral(shinglesName, exprs, 1)),
      "built-in")

  /** Column-level handle (n baked in as a literal). */
  def wordShingles(text: Column, n: Int): Column =
    call_function(shinglesName, text, org.apache.spark.sql.functions.lit(n))
}
