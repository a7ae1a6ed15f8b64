package graft.textops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table. Every computation is expressed with built-in
  * codegen'd functions (no UDFs) and has an exact ANSI-SQL twin for the
  * DuckDB oracle: ratios are emitted as scaled bigints so comparisons are
  * float-exact.
  */
object TextOps {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Whitespace tokens of the lowercased text (empty tokens dropped). */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs / digit runs / single non-space symbols).
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(tokensCol(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  private val stopwords = Seq("the", "a", "an", "and", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as")

  /** Quality scoring: alpha/punct/digit/stopword ratios and a composite
    * score, all scaled to integer 1e4 for oracle-exact comparison.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val toks = tokensCol(col("text"))
    val nToks = size(toks).cast("double")
    val alpha = size(regexp_extract_all(lower(col("text")), lit("[a-z]"), lit(0))).cast("double")
    val punct = size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0))).cast("double")
    val digit = size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).cast("double")
    val stop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double")
    def e4(c: Column): Column = round(c * 10000).cast("long")
    docs(spark, dir)
      .filter(length(col("text")) > 0 && size(tokensCol(col("text"))) > 0)
      .select(
        col("doc_id"),
        e4(alpha / nChars).as("alpha_ratio_e4"),
        e4(punct / nChars).as("punct_ratio_e4"),
        e4(digit / nChars).as("digit_ratio_e4"),
        e4(stop / nToks).as("stopword_ratio_e4"),
        e4((alpha / nChars) * 0.4 + (stop / nToks) * 0.4
          + (lit(1.0) - punct / nChars) * 0.2).as("quality_e4"))
      .orderBy("doc_id")
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Language-ID heuristic: CJK-dominant text is tagged zh by ASCII-letter
    * ratio; otherwise stopword-marker votes with a deterministic tiebreak
    * (en > es > fr > de). Pure expression logic — identical SQL runs in the
    * oracle.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(col("text"))
    val votes: Map[String, Column] = langMarkers.map { case (lang, ws) =>
      lang -> size(filter(toks, t => t.isin(ws.map(lit): _*)))
    }.toMap
    val alphaRatio =
      size(regexp_extract_all(lower(col("text")), lit("[a-z]"), lit(0))).cast("double") /
        length(col("text")).cast("double")
    val pred = when(alphaRatio < 0.4, "zh")
      .when(votes("en") >= votes("es") && votes("en") >= votes("fr")
        && votes("en") >= votes("de"), "en")
      .when(votes("es") >= votes("fr") && votes("es") >= votes("de"), "es")
      .when(votes("fr") >= votes("de"), "fr")
      .otherwise("de")
    docs(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), pred.as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: the minimum md5 over all 8-char shingles
    * (winnowing-style robust fingerprint; identical md5 on both engines
    * makes this oracle-exact).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1))))
          .as("i"),
        col("text"))
      .select(col("doc_id"), md5(col("text").substr(col("i"), lit(8))).as("sh"))
      .groupBy("doc_id")
      .agg(min("sh").as("fingerprint"))
      .orderBy("doc_id")
}
