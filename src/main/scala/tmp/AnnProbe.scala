package tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.util.Tables
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, args(0))
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    timed("corpus count")(emb.count())
    // stage 1: bucketing only
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      explode_outer(Similarity.bucketIds(col("embedding"), 4, 10)).as("bucket"))
      .filter(col("bucket").isNotNull)
    timed("bucketing scan")(c.select(count(lit(1)), countDistinct("bucket")).show())
    // full ann
    val out = Similarity.annTopK(emb.filter(col("vec_id") < 20), emb, 5)
    timed("annTopK full")(println(out.count()))
    out.explain("formatted")
    spark.stop()
  }
}
