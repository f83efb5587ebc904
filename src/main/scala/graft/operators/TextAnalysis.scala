package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, fingerprinting. All pure
  * column expressions (codegen'd, oracle-expressible).
  */
object TextAnalysis {

  /** BPE-ish token pattern: letter runs, digit runs, single other symbols. */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))

  /** Stopword sets per language — function words used by both the quality
    * score and the language-ID heuristic.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "for", "it", "on"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una", "es", "en", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu", "den", "von", "mit"))

  def stopwordCount(tokens: Column, lang: String): Column =
    size(filter(tokens, t =>
      t.isInCollection(Stopwords(lang))))

  /** Quality components + a weighted score. The formula is written with
    * fixed association order so the oracle reproduces it bit-for-bit.
    */
  def withQuality(df: DataFrame, text: Column): DataFrame = {
    val tokens = wordTokens(text)
    val nWords = size(tokens).cast("double")
    val nChars = length(text).cast("double")
    val letters = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val avgWordLen = letters / greatest(nWords, lit(1.0))
    val stopRatio = stopwordCount(tokens, "en").cast("double") / greatest(nWords, lit(1.0))
    val alphaRatio = letters / greatest(nChars, lit(1.0))
    df.withColumn("n_words", size(tokens).cast("long"))
      .withColumn("avg_word_len", avgWordLen)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("quality_score",
        (stopRatio * 0.4) + (alphaRatio * 0.4) +
          (when(avgWordLen >= 3.0 && avgWordLen <= 8.0, 0.2).otherwise(0.0)))
  }

  /** Language-ID heuristic: most stopword hits wins, ties broken in fixed
    * order en > fr > es > de; no hits → "unknown". (The reference corpus
    * here is synthetic ASCII, so this demonstrates the operator shape —
    * swap the stopword tables for real corpora.)
    */
  def langIdExpr(text: Column): Column = {
    val tokens = wordTokens(text)
    val c = Map(
      "en" -> stopwordCount(tokens, "en"),
      "fr" -> stopwordCount(tokens, "fr"),
      "es" -> stopwordCount(tokens, "es"),
      "de" -> stopwordCount(tokens, "de"))
    val top = greatest(c("en"), c("fr"), c("es"), c("de"))
    when(top === 0, "unknown")
      .when(c("en") === top, "en")
      .when(c("fr") === top, "fr")
      .when(c("es") === top, "es")
      .otherwise("de")
  }
}
