package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BinaryFunctions, ByteStride, TextFunctions, VecDot, VectorFunctions, Winnow, WinnowFunctions, WordShingles}

/** `spark.sql.extensions=graft.GraftExtensions` injects the engine's native
  * functions at session build time — the config-file route to the same
  * registration `VectorFunctions.ensureRegistered` performs at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(VectorFunctions.dotName),
      new ExpressionInfo(classOf[VecDot].getName, VectorFunctions.dotName),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier(TextFunctions.shinglesName),
      new ExpressionInfo(classOf[WordShingles].getName, TextFunctions.shinglesName),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs.head, exprs(1).eval().asInstanceOf[Int]),
    ))
    ext.injectFunction((
      FunctionIdentifier(BinaryFunctions.strideName),
      new ExpressionInfo(classOf[ByteStride].getName, BinaryFunctions.strideName),
      (exprs: Seq[Expression]) =>
        ByteStride(exprs.head, exprs(1).eval().asInstanceOf[Int]),
    ))
    ext.injectFunction((
      FunctionIdentifier(WinnowFunctions.winnowName),
      new ExpressionInfo(classOf[Winnow].getName, WinnowFunctions.winnowName),
      (exprs: Seq[Expression]) => Winnow(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
    ))
  }
}
