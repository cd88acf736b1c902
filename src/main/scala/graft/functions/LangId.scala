package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic language identification (replaces the reference's
  * `langdetect.detect`, transform_raw_data.py:132-134 — which is both
  * nondeterministic unless seeded and throws on feature-less text; see
  * SURVEY.md §2.7 F6 for the documented deviation). The reference's
  * langdetect covered ~55 languages; this heuristic covers 51 —
  * twenty-three by Unicode script class and twenty-eight Latin-script
  * languages by stopword argmax — while staying expression-only, codegen'd, and
  * exactly mirrorable in the DuckDB oracle. (Script classes approximate:
  * Cyrillic reads as ru, Arabic script as ar, etc. — the majority language
  * of each script, the same trade every fast lang-id heuristic makes for
  * scripts it has no per-language features for.)
  *
  * Decision order (first match wins, both engines):
  *   1. null/empty → undetected
  *   2. script classes, most-specific first: kana → ja BEFORE han → zh
  *      (Japanese text mixes kanji with kana; han alone reads as Chinese),
  *      hangul → ko, then the single-script alphabets (ru, el, he, ar, hi,
  *      th) — all as literal-codepoint-range regexes, which parse
  *      identically in Java regex (Spark) and RE2 (DuckDB).
  *   3. argmax of distinct stopword hits per Latin-script language, ties
  *      broken by [[langs]] order; zero hits → undetected.
  */
object LangId {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "this", "that", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "y", "en", "que", "es", "un", "una", "por", "perro"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "sind"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "une", "pour", "avec", "sont", "ici"),
    "it" -> Seq("il", "che", "non", "per", "sono", "della", "questo", "anche", "come", "alla"),
    "pt" -> Seq("não", "uma", "mais", "foi", "pela", "são", "também", "isso", "ele", "você"),
    "nl" -> Seq("het", "een", "van", "niet", "ook", "maar", "voor", "zijn", "wordt", "heeft"),
    "pl" -> Seq("nie", "się", "jest", "czy", "tak", "ale", "jak", "przez", "być", "tego"),
    "sv" -> Seq("och", "att", "det", "som", "för", "inte", "med", "på", "är", "av"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "olarak", "çok", "daha", "gibi", "ama"),
    "da" -> Seq("og", "at", "det", "som", "ikke", "med", "på", "er", "af", "til"),
    "no" -> Seq("og", "det", "som", "ikke", "med", "på", "er", "av", "en", "til"),
    "fi" -> Seq("ja", "on", "ei", "että", "joka", "mutta", "myös", "kun", "niin", "ovat"),
    "cs" -> Seq("je", "se", "na", "že", "ale", "jako", "pro", "tak", "byl", "jsou"),
    "ro" -> Seq("și", "de", "la", "cu", "este", "pentru", "din", "care", "mai", "sunt"),
    "hu" -> Seq("és", "az", "hogy", "nem", "egy", "van", "is", "meg", "de", "majd"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"),
    "vi" -> Seq("và", "của", "là", "có", "không", "được", "người", "trong", "một", "cho"),
    "ca" -> Seq("els", "amb", "per", "més", "com", "dels", "aquest", "està", "són", "també"),
    "hr" -> Seq("je", "se", "na", "da", "su", "ali", "kao", "za", "od", "to"),
    // tail languages: same mechanism; sets chosen to carry each language's
    // DISTINCTIVE function words (sk "sa/ako/pre" vs cs "se/jako/pro",
    // ms "kerana/ialah/boleh" vs id "karena/adalah", et "see/aga" vs fi)
    // because shared-script neighbors already occupy the common ones
    "sk" -> Seq("sa", "ako", "pre", "bol", "sú", "aj", "som", "ktorý", "už", "ale"),
    "sl" -> Seq("ki", "tudi", "kot", "pa", "bil", "še", "lahko", "bo", "ni", "da"),
    "lt" -> Seq("ir", "yra", "kad", "tai", "bet", "kaip", "iš", "buvo", "apie", "jos"),
    "lv" -> Seq("ir", "un", "ka", "bet", "arī", "vai", "tika", "viņš", "šis", "tas"),
    "et" -> Seq("ja", "on", "ei", "et", "see", "oli", "ka", "kui", "mis", "aga"),
    "ms" -> Seq("yang", "dan", "di", "untuk", "dengan", "tidak", "pada", "ialah", "kerana", "boleh"),
    "tl" -> Seq("ang", "ng", "sa", "na", "ay", "mga", "hindi", "para", "ito", "siya"),
    "sw" -> Seq("na", "ya", "wa", "ni", "kwa", "katika", "hii", "kama", "za", "cha"),
  )

  /** Latin-script languages in tie-break priority order (new languages
    * append after the existing ones so existing tie behavior is stable).
    */
  val langs: Seq[String] = Seq("en", "es", "de", "fr", "it", "pt", "nl", "pl", "sv", "tr",
    "da", "no", "fi", "cs", "ro", "hu", "id", "vi", "ca", "hr",
    "sk", "sl", "lt", "lv", "et", "ms", "tl", "sw")

  /** (language, literal-codepoint-range character class) in decision order.
    * The ranges are written as Scala unicode escapes so both engines
    * receive literal characters — no engine-specific \\p{script} syntax.
    */
  val scriptClasses: Seq[(String, String)] = Seq(
    "ja" -> "[ぁ-ゟ゠-ヿ]", // hiragana + katakana
    "ko" -> "[가-힣]",              // hangul syllables
    "zh" -> "[一-鿿]",              // unified han
    "ru" -> "[Ѐ-ӿ]",              // cyrillic
    "el" -> "[Ͱ-Ͽ]",              // greek
    "he" -> "[֐-׿]",              // hebrew
    "ar" -> "[؀-ۿ]",              // arabic
    "hi" -> "[ऀ-ॿ]",              // devanagari
    "th" -> "[฀-๿]",              // thai
    "bn" -> "[ঀ-৿]",      // bengali
    "pa" -> "[਀-੿]",      // gurmukhi
    "gu" -> "[઀-૿]",      // gujarati
    "ta" -> "[஀-௿]",      // tamil
    "te" -> "[ఀ-౿]",      // telugu
    "kn" -> "[ಀ-೿]",      // kannada
    "ml" -> "[ഀ-ൿ]",      // malayalam
    "si" -> "[඀-෿]",      // sinhala
    "lo" -> "[຀-໿]",      // lao
    "my" -> "[က-႟]",      // myanmar
    "ka" -> "[Ⴀ-ჿ]",      // georgian
    "hy" -> "[԰-֏]",      // armenian
    "am" -> "[ሀ-፿]",      // ethiopic
    "km" -> "[ក-៿]",      // khmer
  )

  /** Union of every script class — a single guard scan. The common case
    * (Latin-script text) pays ONE regex pass instead of nine: each branch
    * of the script when-chain is a separate full-text scan that finds
    * nothing on Latin input.
    */
  val anyScriptClass: String =
    "[" + scriptClasses.map(_._2.stripPrefix("[").stripSuffix("]")).mkString + "]"

  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val score: Map[String, Column] =
      langs.map(l => l -> size(array_intersect(toks, lit(stopwords(l).toArray)))).toMap
    val best = greatest(langs.map(score): _*)
    val byScore = langs.foldLeft(when(best <= 0, "undetected")) { (acc, l) =>
      acc.when(score(l) === best, l)
    }
    val scriptChain = scriptClasses.foldRight(byScore) { case ((l, cls), acc) =>
      when(regexp_like(text, lit(cls)), l).otherwise(acc)
    }
    val byScript = when(regexp_like(text, lit(anyScriptClass)), scriptChain)
      .otherwise(byScore)
    when(text.isNull || length(text) === 0, "undetected").otherwise(byScript)
  }

  /** Hot-path form of [[langId]]: semantically identical, but materializes
    * the per-language stopword scores (and their max) as real columns in a
    * lower projection, so the decision CASE reads plain column refs.
    *
    * Why this exists: Catalyst's subexpression elimination skips CaseWhen
    * branches (they evaluate conditionally), so the single-Column [[langId]]
    * re-tokenizes and re-intersects per branch reference — measured ~100
    * intersect evaluations per row across the 10-language argmax chain.
    * Here each intersect happens exactly once per row; CollapseProject
    * keeps the boundary because the aliases are non-cheap and
    * multiply-referenced.
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, text: Column, out: String)
      : org.apache.spark.sql.DataFrame = {
    val toks = split(lower(text), "\\s+")
    def sc(l: String) = s"__lid_$l"
    val scored = df.select(
      col("*") +:
        langs.map(l =>
          size(array_intersect(toks, lit(stopwords(l).toArray))).as(sc(l))): _*)
    val best = greatest(langs.map(l => col(sc(l))): _*)
    val byScore = langs.foldLeft(when(best <= 0, "undetected")) { (acc, l) =>
      acc.when(col(sc(l)) === best, l)
    }
    val scriptChain = scriptClasses.foldRight(byScore) { case ((l, cls), acc) =>
      when(regexp_like(text, lit(cls)), l).otherwise(acc)
    }
    val byScript = when(regexp_like(text, lit(anyScriptClass)), scriptChain)
      .otherwise(byScore)
    scored
      .withColumn(out,
        when(text.isNull || length(text) === 0, "undetected").otherwise(byScript))
      .drop(langs.map(sc): _*)
  }

  /** The same heuristic as DuckDB SQL, parameterized on the text expression —
    * used by graft.text oracle queries so the two sides stay in lockstep.
    */
  def duckDbSql(textExpr: String): String = {
    def hits(l: String) =
      s"len(list_intersect(string_split_regex(lower($textExpr), '\\s+'), " +
        s"[${stopwords(l).map(w => s"'$w'").mkString(", ")}]))"
    val best = s"greatest(${langs.map(hits).mkString(", ")})"
    val scriptCases = scriptClasses
      .map { case (l, cls) => s"WHEN regexp_matches($textExpr, '$cls') THEN '$l'" }
      .mkString(" ")
    val cases = langs.map(l => s"WHEN ${hits(l)} = $best THEN '${l}'").mkString(" ")
    s"""CASE WHEN $textExpr IS NULL OR length($textExpr) = 0 THEN 'undetected'
        $scriptCases
        WHEN $best <= 0 THEN 'undetected'
        $cases END"""
  }
}
