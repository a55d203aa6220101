package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ir.Analyzer

/**
 * Text-analysis operators for training-data curation over a
 * `documents`-shaped table. All are single-pass, codegen-friendly column
 * expressions (no shuffle except the language argmax window, which is
 * per-row via a pivoted greatest() — no shuffle at all).
 */
object TextAnalysis {

  /** Tiny per-language function-word sets (deterministic, embedded — the
    * n-gram/stopword-hit heuristic). */
  val LangWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "for", "on"),
    "es" -> Seq("de", "la", "que", "el", "en", "los", "se", "las", "por", "un"),
    "fr" -> Seq("le", "de", "un", "etre", "et", "a", "il", "avoir", "ne", "les"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"))

  private def tokens = split(col("text"), " ")

  /** 6-decimal quantization that is bit-stable across engines: floor of an
    * identical double expression, instead of round(x, 6) whose half-way
    * semantics differ between Spark (BigDecimal HALF_UP) and DuckDB
    * (floating-point) — rational-valued scores DO land on exact .5
    * micro-unit boundaries (12/5000 quality scores at sf0.1). */
  def quantize6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 1e6 + 0.5) / 1e6

  private def hitRatio(lang: String) = {
    val words = LangWords(lang)
    quantize6(
      size(filter(tokens, t => t.isin(words.map(lit(_)): _*))).cast("double") /
        greatest(size(tokens), lit(1)))
  }

  /** Language ID: per-language function-word hit ratio, argmax with
    * deterministic tie-break by language name asc. Output:
    * (doc_id, lang_pred, ratio). */
  def langId(docs: DataFrame): DataFrame = {
    val langs = LangWords.keys.toSeq.sorted
    val scored = langs.foldLeft(docs.select(col("doc_id"), col("text"))) {
      (df, l) => df.withColumn(s"r_$l", hitRatio(l))
    }
    // argmax with lang-asc tie-break: fold over sorted langs, strict >
    val (bestLang, bestR) = langs.tail.foldLeft(
      (lit(langs.head), col(s"r_${langs.head}"))) {
      case ((bl, br), l) =>
        (when(col(s"r_$l") > br, lit(l)).otherwise(bl),
          when(col(s"r_$l") > br, col(s"r_$l")).otherwise(br))
    }
    scored.select(col("doc_id"), bestLang.as("lang_pred"), bestR.as("ratio"))
  }

  /** Token counting: whitespace tokens, alnum-run tokens (BPE-ish regex
    * proxy), and a chars/4 BPE-budget estimate. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
        .as("re_tokens"),
      ceil(length(col("text")).cast("double") / 4).cast("long").as("bpe_est"))

  /** Quality scoring: length, lexical diversity, stopword ratio, mean token
    * length — composite in [0,1]. Deterministic arithmetic only. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val en = Analyzer.EnglishStopwords.toSeq.sorted
    val nTok = size(tokens).cast("double")
    val distinctRatio = size(array_distinct(tokens)).cast("double") / greatest(nTok, lit(1.0))
    val stopRatio = size(filter(tokens, t => t.isin(en.map(lit(_)): _*)))
      .cast("double") / greatest(nTok, lit(1.0))
    val meanLen = (length(col("text")) - (nTok - 1)) / greatest(nTok, lit(1.0))
    val lengthScore = least(nTok / 64.0, lit(1.0))
    val q = lit(0.35) * lengthScore +
      lit(0.25) * distinctRatio +
      lit(0.2) * least(stopRatio * 4.0, lit(1.0)) +
      lit(0.2) * least(meanLen / 8.0, lit(1.0))
    val q6 = quantize6 _
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      q6(distinctRatio).as("distinct_ratio"),
      q6(stopRatio).as("stopword_ratio"),
      q6(meanLen).as("mean_token_len"),
      q6(q).as("quality"))
  }

  /** Document fingerprint: polynomial rolling hash over analyzed tokens
    * (order-sensitive — equal fingerprints ⇔ equal token streams with
    * overwhelming probability). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val cfg = Analyzer.Plain
    val fpUdf = udf((t: String) =>
      Hashing.rollingFingerprint(Analyzer.analyze(t, cfg).iterator))
    docs.select(col("doc_id"), fpUdf(col("text")).as("fingerprint"))
  }
}
