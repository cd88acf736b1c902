package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic language identification (replaces the reference's
  * `langdetect.detect`, transform_raw_data.py:132-134 — which is both
  * nondeterministic unless seeded and throws on feature-less text; see
  * SURVEY.md §2.7 F6 for the documented deviation).
  *
  * Heuristic: CJK codepoint presence → zh; otherwise argmax of distinct
  * stopword hits per language (ties broken en > es > de > fr); zero hits or
  * empty/null text → "undetected". Built entirely from codegen'd built-in
  * expressions (split / array_intersect / greatest) — no UDF, so it inlines
  * into whole-stage codegen and is trivially mirrored in the DuckDB oracle
  * (string_split_regex / list_intersect).
  */
object LangId {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "this", "that", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "y", "en", "que", "es", "un", "una", "por", "perro"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "sind"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "une", "pour", "avec", "sont", "ici"),
  )

  /** Languages in tie-break priority order. */
  val langs: Seq[String] = Seq("en", "es", "de", "fr")

  private val cjkPattern = "[一-鿿]"

  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val score: Map[String, Column] =
      langs.map(l => l -> size(array_intersect(toks, lit(stopwords(l).toArray)))).toMap
    val best = greatest(langs.map(score): _*)
    val byScore = langs.foldLeft(when(best <= 0, "undetected")) { (acc, l) =>
      acc.when(score(l) === best, l)
    }
    when(text.isNull || length(text) === 0, "undetected")
      .when(regexp_like(text, lit(cjkPattern)), "zh")
      .otherwise(byScore)
  }

  /** The same heuristic as DuckDB SQL, parameterized on the text expression —
    * used by graft.text oracle queries so the two sides stay in lockstep.
    */
  def duckDbSql(textExpr: String): String = {
    def hits(l: String) =
      s"len(list_intersect(string_split_regex(lower($textExpr), '\\s+'), " +
        s"[${stopwords(l).map(w => s"'$w'").mkString(", ")}]))"
    val best = s"greatest(${langs.map(hits).mkString(", ")})"
    val cases = langs.map(l => s"WHEN ${hits(l)} = $best THEN '${l}'").mkString(" ")
    s"""CASE WHEN $textExpr IS NULL OR length($textExpr) = 0 THEN 'undetected'
        WHEN regexp_matches($textExpr, '$cjkPattern') THEN 'zh'
        WHEN $best <= 0 THEN 'undetected'
        $cases END"""
  }
}
