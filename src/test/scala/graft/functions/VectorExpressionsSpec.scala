package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec
import graft.util.Tables

class VectorExpressionsSpec extends SparkSpec {

  test("native vec_dot is bit-identical to the HOF fold it replaced") {
    VectorFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf()).limit(50)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    val both = emb.select(
      VectorFunctions.vecDot(col("embedding"), col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    // bitwise equality, not tolerance — both are the same sequential fold
    assert(rows.forall(r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("word shingles addressable from SQL and null-safe") {
    TextFunctions.ensureRegistered(spark)
    import spark.implicits._
    Seq(("a b c d", 1)).toDF("text", "id").createOrReplaceTempView("ws_t")
    val viaSql = spark.sql(
      s"SELECT ${TextFunctions.shinglesName}(text, 3) AS sh FROM ws_t")
      .collect()(0).getSeq[String](0)
    assert(viaSql === Seq("a b c", "b c d"))
    // null text → null array (callers that want the empty-set contract
    // coalesce, as Dedup.shingleSets does)
    val nullOut = Seq((Option.empty[String], 1)).toDF("text", "id")
      .select(TextFunctions.wordShingles(col("text"), 3).as("sh")).collect()
    assert(nullOut(0).isNullAt(0))
  }

  test("pq_argmin nulls out a codebook-dimension mismatch instead of guessing") {
    VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val book = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val df = Seq(Seq(0.9, 1.1), Seq(0.9, 1.1, 7.0), Seq(0.9)).toDF("x")
    val out = df.select(
      VectorFunctions.pqArgmin(col("x"), typedLit(book)).as("b")).collect()
    assert(out(0).getStruct(0).getInt(1) === 1) // matched length still codes
    assert(out(1).isNullAt(0)) // longer than d: null, not silent truncation
    assert(out(2).isNullAt(0)) // shorter than d: null, not zero-padding
  }

  test("vec_dot handles mixed float/double arrays and nulls") {
    VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Some(Seq(2.0, 0.5, 1.0))),
      (Seq(1.0f, 1.0f), None),
    ).toDF("f", "d")
    val out = df.select(VectorFunctions.vecDot(col("f"), col("d")).as("dot")).collect()
    assert(out(0).getDouble(0) === 2.0 + 1.0 + 3.0)
    assert(out(1).isNullAt(0))
  }
}
