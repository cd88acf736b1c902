package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

/** The in-engine signSGD quality model: the oracle pins bit-equality of
  * the trained scores; this spec pins that the training actually LEARNS —
  * the lattice weights discover the planted +/+/−/− structure and the
  * keep decision beats the majority class — and that the whole loop is
  * deterministic (retrain → identical model).
  */
class QualityModelSpec extends SparkSpec {

  // sf0.01 (the driver's correctness scale): at 50 docs the 12 sign steps
  // haven't separated yet — learning-rate tuning targets the 500+-doc tier
  private def docs = Tables.documents(spark, sf("sf0.01"))

  test("training discovers the planted compositional structure") {
    val out = QualityModel.trainPredict(docs)
    val feats = QualityModel.features(docs)
    val joined = out.join(feats.select("doc_id", "y"), "doc_id")
    val n = joined.count()
    val correct = joined
      .filter(col("keep") === (col("y") === 1L)).count()
    val acc = correct.toDouble / n
    val posRate = feats.filter(col("y") === 1L).count().toDouble / n
    val majority = math.max(posRate, 1 - posRate)
    // the planted label is a DIFFERENCE of word counts — no single feature
    // expresses it, so beating majority means the signs were learned
    assert(acc > majority + 0.1,
      s"accuracy $acc does not beat majority $majority — model learned nothing")
    assert(acc >= 0.95, s"separable target, expected near-perfect: $acc")
  }

  test("retraining is bit-deterministic (same corpus, same scores)") {
    val a = QualityModel.trainPredict(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val b = QualityModel.trainPredict(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(a.toSeq === b.toSeq)
  }

  test("scores live on the exact decimal lattice the sign updates span") {
    // every weight is lr_k·{−12..12}, so score·2^15·10^6 over integer
    // features must be integral (lr denominators: 2^-5 and 1.25e-4) up to
    // the double cast's ulp (~4e-6 at 3e10) — a float anywhere in the
    // TRAINING chain would smear far beyond that
    val out = QualityModel.trainPredict(docs.limit(50))
    val scaled = col("score") * lit(32768.0) * lit(1000000.0)
    val bad = out.filter(abs(scaled - round(scaled)) > lit(1e-3))
    assert(bad.count() === 0)
  }
}
