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
/** Argmin-by-L2 over a FOLDABLE codebook (kernel 16, for product
  * quantization): one call scans all ksub centroids in a tight primitive
  * loop and returns (dist, code, dotxc, c2) of the nearest one. The
  * expression-tree formulation — ksub separate [[VecDot]] literal dot
  * products folded through array_min(struct…) — was semantically identical
  * but each run carried a codebook-sized generated-code body (literals
  * inline into codegen, so every fresh codebook recompiles ~130
  * expressions); here the codebook and its precomputed ‖c‖² live as
  * codegen REFERENCE OBJECTS, the generated call site is one line, and
  * the per-row cost is the two nested loops PQ actually needs. Ties break
  * to the lower code (ascending scan, strict improvement), matching the
  * struct-min ordering it replaces bit-for-bit.
  */
case class PqArgmin(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val okRight = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (okLeft && okRight) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_pq_argmin expects (array<float|double>, foldable array<array<double>>), " +
          s"got ${left.dataType} / ${right.dataType} (foldable=${right.foldable})")
    }
  }

  override def dataType: DataType = PqArgmin.outType

  // null (not a plausible wrong code) on a vector whose length differs from
  // the codebook dimension — dimension mismatch is a caller bug, and
  // silently zero-padding/truncating would hand back wrong codes
  override def nullable: Boolean = true

  @transient private lazy val book: Array[Array[Double]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(j => ad.getArray(j).toDoubleArray())
  }
  @transient private lazy val c2: Array[Double] = book.map(_.map(v => v * v).sum)
  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    PqArgmin.compute(a.asInstanceOf[ArrayData], leftIsFloat, book, c2)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"""${ev.value} = graft.functions.PqArgmin.compute($a, $leftIsFloat, $bookRef, $c2Ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqArgmin =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_argmin"
}

object PqArgmin {

  val outType: StructType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("dotxc", DoubleType, nullable = false),
    StructField("c2", DoubleType, nullable = false)))

  def compute(x: ArrayData, isFloat: Boolean, book: Array[Array[Double]],
      c2: Array[Double]): org.apache.spark.sql.catalyst.InternalRow = {
    val d = book(0).length
    if (x.numElements() != d) return null // dimension mismatch → null row
    val xv = new Array[Double](d)
    val n = d
    var i = 0
    while (i < n) {
      xv(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    var x2 = 0.0
    i = 0
    while (i < d) { x2 += xv(i) * xv(i); i += 1 }
    var bestDist = Double.PositiveInfinity
    var bestJ = 0
    var bestDot = 0.0
    var j = 0
    while (j < book.length) {
      val c = book(j)
      var dot = 0.0
      var k = 0
      while (k < d) { dot += xv(k) * c(k); k += 1 }
      val dist = x2 - 2 * dot + c2(j)
      if (dist < bestDist) { bestDist = dist; bestJ = j; bestDot = dot }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestDist, bestJ, bestDot, c2(bestJ)))
  }
}

object VectorFunctions {

  val dotName = "graft_vec_dot"
  val pqArgminName = "graft_pq_argmin"

  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      dotName, exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      pqArgminName, exprs => PqArgmin(exprs(0), exprs(1)), "built-in")
  }

  /** Column-level handle (resolves against the session registry). */
  def vecDot(a: Column, b: Column): Column = call_function(dotName, a, b)

  def pqArgmin(x: Column, book: Column): Column = call_function(pqArgminName, x, book)
}
