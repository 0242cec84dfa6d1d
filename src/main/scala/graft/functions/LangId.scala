package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification: marker-token profiles per language
  * plus a CJK-character ratio check, all as Column expressions (one
  * projection, no shuffle). For real pipelines the profiles would come
  * from n-gram tables; the structure (argmax over per-language scores) is
  * the production shape.
  */
object LangId {

  val Profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "with", "as", "his", "on", "be", "at", "by", "had"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein",
      "eine", "zu", "den", "von", "sie", "ich", "des", "auf", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "des", "du",
      "que", "qui", "dans", "pour", "pas", "sur", "avec", "au"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "un", "de",
      "que", "en", "por", "con", "para", "su", "al", "lo", "como"))

  /** Fraction of characters in the CJK unified-ideograph range. */
  def cjkRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, lit(0.0)).otherwise(
      (len - length(regexp_replace(c, "[\\x{4e00}-\\x{9fff}]", ""))).cast("double") / len)
  }

  /** Per-language marker-token hit ratio over an ALREADY-TOKENIZED
    * lowered array (callers bind the tokenization once). */
  private def profileScoreOf(ts: Column, lang: String): Column = {
    val n = size(ts)
    when(n === 0, lit(0.0)).otherwise(
      size(filter(ts, t => array_contains(lit(Profiles(lang).toArray), t)))
        .cast("double") / n)
  }

  /** Per-language marker-token hit ratio. */
  def profileScore(c: Column, lang: String): Column =
    TextFunctions.bound(TextFunctions.tokens(lower(c)))(profileScoreOf(_, lang))

  /** Predicted language: 'zh' if CJK-dominated, else argmax profile
    * score (ties to the alphabetically-first language), else 'unknown'
    * when no profile fires.
    *
    * One tokenization per row: the lowered token array is [[TextFunctions.bound]]
    * and every profile scores from it; the argmax is a single
    * `greatest()` over (score, -index) structs — ties pick the larger
    * -index = the earlier language, exactly the strict-`>` fold this
    * replaces, whose when-chains duplicated every partial best in both
    * branches (lambda-bearing subtrees are exempt from subexpression
    * elimination, so that re-ran the tokenizing score exponentially
    * many times). */
  def langId(c: Column): Column = {
    val langs = Profiles.keys.toSeq.sorted
    TextFunctions.bound(TextFunctions.tokens(lower(c))) { ts =>
      val entries = langs.zipWithIndex.map { case (l, i) =>
        struct(profileScoreOf(ts, l).as("s"), lit(-i).as("ni"))
      }
      TextFunctions.bound(greatest(entries: _*)) { best =>
        when(cjkRatio(c) > 0.3, lit("zh"))
          .when(best.getField("s") > 0.0,
            element_at(lit(langs.toArray), -best.getField("ni") + 1))
          .otherwise(lit("unknown"))
      }
    }
  }
}
