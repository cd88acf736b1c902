package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic language identification (replaces the reference's
  * `langdetect.detect`, transform_raw_data.py:132-134 — which is both
  * nondeterministic unless seeded and throws on feature-less text; see
  * SURVEY.md §2.7 F6 for the documented deviation). The reference's
  * langdetect covered ~55 languages; this heuristic covers 62 —
  * twenty-three script classes (seven of which disambiguate further, see
  * below) and thirty-two Latin-script languages by stopword argmax — while
  * staying expression-only, codegen'd, and exactly mirrorable in the
  * DuckDB oracle.
  *
  * Decision order (first match wins, both engines):
  *   1. null/empty → undetected
  *   2. script classes, most-specific first: kana → ja BEFORE han → zh
  *      (Japanese text mixes kanji with kana; han alone reads as Chinese),
  *      hangul → ko, then the single-script alphabets — all as
  *      literal-codepoint-range regexes, which parse identically in Java
  *      regex (Spark) and RE2 (DuckDB). Scripts SHARED by several
  *      languages (Cyrillic: ru/uk/bg/mk, Arabic script: ar/fa/ur,
  *      Devanagari: hi/mr/ne) run a second argmax over script-internal
  *      DISTINCTIVE function words; zero hits falls back to the script's
  *      majority language, which is what round-6's flat mapping always
  *      answered.
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
    "af" -> Seq("baie", "vir", "hierdie", "gesê", "hulle", "daardie", "jou", "sal", "wees", "ons"),
    "cy" -> Seq("mae", "wedi", "hefyd", "gyda", "iawn", "bod", "dweud", "hwn", "ond", "eich"),
    "so" -> Seq("waa", "ayaa", "waxaa", "iyo", "lagu", "soo", "sidoo", "kale", "dhan", "uga"),
    "sq" -> Seq("është", "që", "një", "për", "shumë", "nga", "dhe", "kjo", "janë", "tij"),
  )

  /** Latin-script languages in tie-break priority order (new languages
    * append after the existing ones so existing tie behavior is stable).
    */
  val langs: Seq[String] = Seq("en", "es", "de", "fr", "it", "pt", "nl", "pl", "sv", "tr",
    "da", "no", "fi", "cs", "ro", "hu", "id", "vi", "ca", "hr",
    "sk", "sl", "lt", "lv", "et", "ms", "tl", "sw", "af", "cy", "so", "sq")

  /** Script-internal disambiguation for scripts several supported languages
    * share, keyed by the script class's majority language. Member order is
    * the tie-break (majority language first); the word sets are DISTINCTIVE
    * — orthography that exists in exactly one member (ru "это" vs uk "це"
    * vs bg "това" vs mk "тоа"; fa "است" vs ur "ہے"; hi "है" vs mr "आहे" vs
    * ne "छ") — so a tie means genuinely ambiguous text, which falls to the
    * majority member.
    */
  val scriptGroups: Map[String, Seq[(String, Seq[String])]] = Map(
    "ru" -> Seq(
      "ru" -> Seq("это", "что", "как", "его", "она", "чтобы", "очень", "уже", "есть", "был"),
      "uk" -> Seq("це", "дуже", "і", "він", "вже", "але", "вона", "та", "його", "що"),
      "bg" -> Seq("това", "е", "ще", "има", "защото", "съм", "които", "него"),
      "mk" -> Seq("тоа", "ќе", "затоа", "сум", "кои", "нешто", "само", "многу", "како", "од")),
    "ar" -> Seq(
      "ar" -> Seq("في", "من", "على", "هذا", "التي", "أن", "إلى", "كان", "مع", "هو"),
      "fa" -> Seq("است", "که", "این", "را", "با", "های", "برای", "آن", "یک", "شده"),
      "ur" -> Seq("ہے", "کے", "کی", "میں", "اور", "ایک", "سے", "کو", "نے", "پر")),
    "hi" -> Seq(
      "hi" -> Seq("है", "के", "की", "में", "और", "एक", "से", "को", "ने", "पर"),
      "mr" -> Seq("आहे", "आणि", "यांनी", "केली", "असून", "होते", "झाली", "मात्र", "तसेच", "खूप"),
      "ne" -> Seq("छ", "र", "पनि", "भएको", "गरेको", "लागि", "भने", "गर्न", "हुने", "छन्")),
  )

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

  /** Within-script argmax for a shared-script class: distinctive-word hit
    * counts per member, zero hits → the script's majority language.
    * Evaluated only on rows whose script matched, so the nested intersects
    * cost nothing on the (dominant) Latin path.
    */
  private def scriptGroupDecision(text: Column, default: String,
      members: Seq[(String, Seq[String])]): Column = {
    val toks = split(lower(text), "\\s+")
    val scores = members.map { case (l, ws) =>
      l -> size(array_intersect(toks, lit(ws.toArray)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(best <= 0, default)) { case (acc, (l, sc)) =>
      acc.when(sc === best, l)
    }
  }

  /** The script when-chain shared by [[langId]] and [[withLangId]]:
    * script classes in decision order, shared scripts disambiguated.
    */
  private def scriptChainOver(text: Column, byScore: Column): Column = {
    val chain = scriptClasses.foldRight(byScore) { case ((l, cls), acc) =>
      val verdict: Column = scriptGroups.get(l)
        .map(ms => scriptGroupDecision(text, l, ms))
        .getOrElse(lit(l))
      when(regexp_like(text, lit(cls)), verdict).otherwise(acc)
    }
    when(regexp_like(text, lit(anyScriptClass)), chain).otherwise(byScore)
  }

  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val score: Map[String, Column] =
      langs.map(l => l -> size(array_intersect(toks, lit(stopwords(l).toArray)))).toMap
    val best = greatest(langs.map(score): _*)
    val byScore = langs.foldLeft(when(best <= 0, "undetected")) { (acc, l) =>
      acc.when(score(l) === best, l)
    }
    val byScript = scriptChainOver(text, byScore)
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
    val byScript = scriptChainOver(text, byScore)
    scored
      .withColumn(out,
        when(text.isNull || length(text) === 0, "undetected").otherwise(byScript))
      .drop(langs.map(sc): _*)
  }

  /** The same heuristic as DuckDB SQL, parameterized on the text expression —
    * used by graft.text oracle queries so the two sides stay in lockstep.
    */
  def duckDbSql(textExpr: String): String = {
    def wordHits(ws: Seq[String]) =
      s"len(list_intersect(string_split_regex(lower($textExpr), '\\s+'), " +
        s"[${ws.map(w => s"'$w'").mkString(", ")}]))"
    def hits(l: String) = wordHits(stopwords(l))
    val best = s"greatest(${langs.map(hits).mkString(", ")})"
    def groupCase(default: String, members: Seq[(String, Seq[String])]): String = {
      val gbest = s"greatest(${members.map(m => wordHits(m._2)).mkString(", ")})"
      val arms = members
        .map { case (l, ws) => s"WHEN ${wordHits(ws)} = $gbest THEN '$l'" }
        .mkString(" ")
      s"(CASE WHEN $gbest <= 0 THEN '$default' $arms END)"
    }
    val scriptCases = scriptClasses
      .map { case (l, cls) =>
        val verdict = scriptGroups.get(l).map(groupCase(l, _)).getOrElse(s"'$l'")
        s"WHEN regexp_matches($textExpr, '$cls') THEN $verdict"
      }
      .mkString(" ")
    val cases = langs.map(l => s"WHEN ${hits(l)} = $best THEN '${l}'").mkString(" ")
    s"""CASE WHEN $textExpr IS NULL OR length($textExpr) = 0 THEN 'undetected'
        $scriptCases
        WHEN $best <= 0 THEN 'undetected'
        $cases END"""
  }
}
