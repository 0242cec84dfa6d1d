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

  /** Per-language marker-token hit ratio. */
  def profileScore(c: Column, lang: String): Column = {
    val ts = TextFunctions.tokens(lower(c))
    val n = size(ts)
    when(n === 0, lit(0.0)).otherwise(
      size(filter(ts, t => array_contains(lit(Profiles(lang).toArray), t)))
        .cast("double") / n)
  }

  /** Predicted language: 'zh' if CJK-dominated, else argmax profile
    * score, else 'unknown' when no profile fires. */
  def langId(c: Column): Column = {
    val scored = Profiles.keys.toSeq.sorted.map(l => (l, profileScore(c, l)))
    // argmax via a fold over (bestLang, bestScore)
    val (bestLang, bestScore) = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) =>
        (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(cjkRatio(c) > 0.3, lit("zh"))
      .when(bestScore > 0.0, bestLang)
      .otherwise(lit("unknown"))
  }
}
