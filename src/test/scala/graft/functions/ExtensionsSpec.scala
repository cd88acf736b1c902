package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The spark.sql.extensions route (graft.GraftExtensions) and the raw
  * Catalyst eval contracts of the native kernels — exercised without a
  * plan, so type/null behavior is pinned at the Expression level.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions installs all native functions without error") {
    // building a second SparkContext to pass the config is not possible in
    // the shared test JVM; applying the injector directly exercises the
    // same registration path the config route runs at session build
    new graft.GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("kernel eval contracts: values and nulls, no plan needed") {
    // WordShingles
    val sh = WordShingles(Literal("a b c d"), 3).eval(null).asInstanceOf[ArrayData]
    assert(sh.numElements() === 2)
    assert(sh.getUTF8String(0).toString === "a b c")
    assert(sh.getUTF8String(1).toString === "b c d")
    assert(WordShingles(Literal(null, org.apache.spark.sql.types.StringType), 3)
      .eval(null) === null)
    // duplicate grams collapse to first occurrence
    val dup = WordShingles(Literal("x y x y x y x"), 2).eval(null).asInstanceOf[ArrayData]
    assert(dup.numElements() === 2)
    // ByteStride
    val strided = ByteStride(Literal(Array[Byte](1, 2, 3, 4, 5)), 2)
      .eval(null).asInstanceOf[Array[Byte]]
    assert(strided.toSeq === Seq[Byte](1, 3, 5))
    // VecDot over array literals
    val dot = VecDot(
      Literal.create(Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      Literal.create(Seq(3.0, 0.5), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)))
      .eval(null).asInstanceOf[Double]
    assert(dot === 4.0)
    // interned UTF8String round-trip safety: shingles over multibyte text
    val uni = WordShingles(Literal("é 嗨 x"), 3).eval(null).asInstanceOf[ArrayData]
    assert(uni.getUTF8String(0) === UTF8String.fromString("é 嗨 x"))
  }
}
