package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native vector kernels as Catalyst expressions (SURVEY.md custom-operator
  * preference order: compose built-ins < custom Expression < custom plan).
  *
  * The built-in way to fold a dot product — `aggregate(zip_with(a, b, *))` —
  * is a higher-order function: HOFs carry lambda variables, are excluded
  * from whole-stage codegen, and allocate an intermediate zipped array per
  * row. In the hottest loop this engine has (cosine over millions of
  * candidate pairs), that interpretation overhead dominates the query.
  * [[VecDot]] is the same arithmetic — a sequential left-to-right fold in
  * DOUBLE, bit-identical to the HOF form and to DuckDB's
  * list_cosine_similarity numerator — generated as a tight primitive loop
  * inside whole-stage codegen: no lambda dispatch, no intermediate array.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += ${get(a, elemType(left), i)} * ${get(b, elemType(right), i)};
        }
        ${ev.value} = $s;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vec_dot"
}

/** Session registration for the native kernels. Idempotent — callers invoke
  * it at plan-construction time with whatever session the driver hands
  * them, so the library works without any spark.sql.extensions config
  * (and [[graft.GraftExtensions]] offers the config route too).
  */
object VectorFunctions {

  val dotName = "graft_vec_dot"

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      dotName, exprs => VecDot(exprs(0), exprs(1)), "built-in")

  /** Column-level handle (resolves against the session registry). */
  def vecDot(a: Column, b: Column): Column = call_function(dotName, a, b)
}
