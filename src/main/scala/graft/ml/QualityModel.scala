package graft.ml

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.util.{Q, Tables}

/** Model-based quality filtering, trained IN the engine: a linear
  * classifier fit by full-batch signSGD (sign-of-gradient descent,
  * Bernstein et al. 2018, "signSGD: Compressed Optimisation for Non-Convex
  * Problems" — the 1-bit gradient-compression scheme distributed training
  * uses), then applied row-locally — the FineWeb-edu / DCLM-style "train a
  * small quality model, score the corpus" loop as a Spark-first operator
  * instead of an external ML stack.
  *
  * Why signSGD and not plain GD here:
  *  - **One aggregation pass per iteration.** The gradient of the square
  *    loss, grad_k = Σ rows (w·x − y)·x_k, is a map-side-combinable SUM of
  *    per-row terms — per iteration the cluster does one scan of a skinny
  *    integer feature frame (checkpointed once) and ships ONE partial
  *    vector per partition to the driver. The weights are a handful of
  *    scalars (the PageRank-convergence precedent: driver holds O(k)
  *    numbers, never rows).
  *  - **Corpus-size invariance.** Only the gradient's SIGN is used, so the
  *    same learning rates work at 500 docs and 5 billion — full-batch GD
  *    would need lr ∝ 1/N re-tuning per corpus.
  *  - **Exact cross-engine arithmetic.** Features are integers; weights
  *    move on the lattice w_k ∈ lr_k·{−T..T}, so every weight, every
  *    per-row score w·x, and every gradient term is an EXACT DECIMAL —
  *    no float sums (order-dependent), no exp/ln (libm ulp drift), no
  *    decimal division or rounding (engine-specific rules) anywhere. The
  *    DuckDB oracle replays the identical 12 unrolled iterations and the
  *    driver hash-checks the trained model's SCORES, not just labels —
  *    a trained-model query that is bit-reproducible across engines.
  *
  * Features (per doc, exact integer expressions both engines share):
  * bias 1, token count, and occurrence counts of four content words; the
  * planted label y = 1 iff cnt(table)+cnt(scan) > cnt(query)+cnt(value) is
  * a COMPOSITIONAL target a single feature cannot express — the training
  * has to discover the +/+/−/− structure (QualityModelSpec pins that it
  * does, and that accuracy beats the majority class).
  */
object QualityModel {

  /** Content words whose occurrence counts are features — none is a
    * substring of another vocab word, so replace()-count is word-exact.
    */
  val words: Seq[String] = Seq("table", "scan", "query", "value")

  val iterations = 12

  /** Per-feature learning rates (exact decimal literals): the lattice
    * scaling knob — bias moves in coarse steps, the token count (a noise
    * feature at ~60× the scale of the word counts) in fine ones.
    */
  val lrs: Seq[JBigDecimal] = Seq(
    new JBigDecimal("0.03125"), // bias
    new JBigDecimal("0.000125"), // tokens
    new JBigDecimal("0.03125"), new JBigDecimal("0.03125"), // table, scan
    new JBigDecimal("0.03125"), new JBigDecimal("0.03125")) // query, value

  /** Decision cutoff on the square-loss score (y targets {0,1}). */
  val cutoff = new JBigDecimal("0.25")

  private def cnt(w: String): Column =
    ((length(col("text")) - length(regexp_replace(col("text"),
      java.util.regex.Pattern.quote(w), ""))) / w.length).cast(LongType)

  /** The integer feature frame: (doc_id, y, x0..x5). */
  def features(docs: DataFrame): DataFrame = {
    val fs = Seq(lit(1L).as("x0"),
      size(split(col("text"), " ")).cast(LongType).as("x1")) ++
      words.zipWithIndex.map { case (w, i) => cnt(w).as(s"x${i + 2}") }
    docs.select(col("doc_id") +: fs: _*)
      .withColumn("y",
        when(col("x2") + col("x3") > col("x4") + col("x5"), 1L).otherwise(0L))
  }

  /** Train by 12 full-batch signSGD steps and return per-doc scores +
    * labels. Deterministic end to end: same corpus → same model, same
    * scores, bit for bit, on any engine that sums integers exactly.
    */
  def trainPredict(docs: DataFrame): DataFrame = {
    val k = lrs.length
    // one scan materializes the skinny integer frame all 12 iterations read
    val feats = features(docs).localCheckpoint()
    var w: Array[JBigDecimal] = Array.fill(k)(JBigDecimal.ZERO)
    for (_ <- 1 to iterations) {
      // pred is an exact decimal (int features × lattice weights); the
      // gradient sums are decimal-exact and map-side combinable
      val pred = (0 until k).map(i =>
        lit(w(i)).cast(DecimalType(26, 12)) * col(s"x$i")).reduce(_ + _)
      val err = (pred - col("y")).cast(DecimalType(30, 12))
      val row = feats.agg(
        sum((err * col("x0")).cast(DecimalType(38, 12))).as("g0"),
        (1 until k).map(i =>
          sum((err * col(s"x$i")).cast(DecimalType(38, 12))).as(s"g$i")): _*)
        .head()
      w = w.indices.map { i =>
        val g = row.getDecimal(i)
        val s = if (g == null) 0 else g.signum()
        w(i).subtract(lrs(i).multiply(new JBigDecimal(s)))
      }.toArray
    }
    val score = (0 until k).map(i =>
      lit(w(i)).cast(DecimalType(26, 12)) * col(s"x$i")).reduce(_ + _)
    feats.select(col("doc_id"),
      score.cast(DoubleType).as("score"),
      (score > lit(cutoff)).as("keep"))
  }

  /** The identical 12 iterations unrolled as DuckDB CTEs: w0 holds the
    * zero weights; each step derives g{i} (gradient sums over the feature
    * CTE cross-joined with the previous weights) and w{i} (the sign
    * update). Every value is exact decimal/integer arithmetic, which is
    * what lets the driver hash the SCORES.
    */
  private def oracleSql: String = {
    val k = lrs.length
    val featSql =
      s"""f AS (
         |  SELECT doc_id, 1 AS x0,
         |         len(string_split(text, ' ')) AS x1,
         |         ${words.zipWithIndex.map { case (w, i) =>
             s"(length(text) - length(replace(text, '$w', ''))) // ${w.length} AS x${i + 2}"
           }.mkString(",\n         ")}
         |  FROM documents
         |), fy AS (
         |  SELECT *, CASE WHEN x2 + x3 > x4 + x5 THEN 1 ELSE 0 END AS y FROM f
         |), w0 AS (SELECT ${(0 until k).map(i =>
             s"CAST(0 AS DECIMAL(26,12)) AS w$i").mkString(", ")})""".stripMargin
    val steps = (1 to iterations).map { it =>
      val pred = (0 until k).map(i => s"w$i * x$i").mkString(" + ")
      s"""g$it AS (
         |  SELECT ${(0 until k).map(i =>
             s"sum(CAST(($pred - y) * x$i AS DECIMAL(38,12))) AS g$i").mkString(",\n         ")}
         |  FROM fy CROSS JOIN w${it - 1}
         |), w$it AS (
         |  SELECT ${(0 until k).map(i =>
             s"CAST(w$i - ${lrs(i).toPlainString} * (CASE WHEN g$i > 0 THEN 1 WHEN g$i < 0 THEN -1 ELSE 0 END) AS DECIMAL(26,12)) AS w$i")
             .mkString(",\n         ")}
         |  FROM w${it - 1} CROSS JOIN g$it
         |)""".stripMargin
    }.mkString(",\n")
    val predFinal = (0 until k).map(i => s"w$i * x$i").mkString(" + ")
    s"""WITH $featSql,
       |$steps
       |SELECT doc_id, CAST($predFinal AS DOUBLE) AS score,
       |       ($predFinal) > ${cutoff.toPlainString} AS keep
       |FROM fy CROSS JOIN w$iterations
       |ORDER BY doc_id""".stripMargin
  }

  /** Trained-model corpus scoring, oracle-checked to the BIT on scores:
    * DuckDB re-runs the same 12 signSGD iterations from the same features
    * and must land on the same weights, scores, and keep labels.
    */
  val q_quality_model: Q = Q("q_quality_model", Some(oracleSql)) { (s, d) =>
    trainPredict(Tables.documents(s, d)).orderBy("doc_id")
  }

  def all: Seq[Q] = Seq(q_quality_model)
}
