package graft.ir

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/**
 * P8: optional regex special-token extraction pre-pass (OFF in the default
 * analyzer profile — the reference query side never applies it, so enabling
 * it index-side breaks index/query symmetry; see SURVEY.md §1.3).
 *
 * Semantics mirror the reference extractors
 * (`/root/reference/IR_server/IR_python/modulos/RegexTokenizer.py:37-115` and
 * the orchestration in `modulos/LexAnalyser.py:39-46,119-150`): each
 * extractor removes its matches from the line, in a fixed order; extracted
 * terms bypass the stopword/length filters; HTML entities are extracted (so
 * they vanish from the text) but NOT kept as terms.
 */
object RegexTokens extends Serializable {

  private val abbrev: Regex =
    ("[A-Z][bcdfghj-np-tvxz]+\\." + "|" + "[A-Za-z]\\.(?:[A-Za-z0-9]\\.)+").r
  private val htmlEntity: Regex = "&(?:[a-z]+|#x?\\d+);".r
  private val date: Regex = "[0-9]{1,2}[/|\\-][0-9]{1,2}[/|\\-](?:[0-9]{2,4})".r
  private val percent: Regex = "(\\+\\-)?[0-9]+(.)?[0-9]*%".r
  private val money: Regex = "\\$\\d+(?:,\\d{1,2})?".r
  private val phone: Regex = "(?:\\(\\d{2,}\\))\\s?\\d{2,}(?:\\-\\d+)?\\s".r
  private val url: Regex =
    ("(https?://(?:www\\.|(?!www))[a-z0-9.]+\\.[a-z0-9/?=]{2,}" +
      "|www\\.[a-z0-9]+\\.[a-z0-9/?=]{2,})").r
  private val email: Regex =
    "[a-zA-Z0-9!#$%&'*+\\-/=?^_`{|}~.]+@[a-z0-9\\-]+\\.[a-z]+(?:\\.[a-z]+)+".r
  private val properName: Regex = "[A-Z][a-z]+(?:[\\s][A-Z][a-z]+)+".r

  final case class Extracted(terms: Seq[String], remaining: String)

  private def extract(r: Regex, line: String, sink: ArrayBuffer[String]): String = {
    r.findAllIn(line).foreach(sink += _)
    r.replaceAllIn(line, "")
  }

  /** Run all extractors in reference order; returns special terms (HTML
    * entities excluded) + the stripped line for normal tokenization. */
  def apply(line: String): Extracted = {
    val terms = new ArrayBuffer[String]()
    val html = new ArrayBuffer[String]()
    var s = line
    s = extract(abbrev, s, terms)
    s = extract(htmlEntity, s, html) // removed from text, not kept as terms
    s = extract(date, s, terms)
    s = extract(percent, s, terms)
    s = extract(money, s, terms)
    s = extract(phone, s, terms)
    s = extract(url, s, terms)
    s = extract(email, s, terms)
    // proper names are matched on the accent-stripped line (reference
    // normalizes before this extractor)
    val stripped = Analyzer.stripAccents(s)
    val out = extract(properName, stripped, terms)
    Extracted(terms.toSeq, out)
  }

  /** Full analysis with the regex pre-pass: normal pipeline over the
    * stripped line, special terms appended unfiltered (reference
    * `LexAnalyser.analyse` ordering). Equivalent to setting `regex = true`
    * on the config — Analyzer.analyze owns the orchestration now that the
    * flag is wired into AnalyzerConfig. */
  def analyzeWithRegex(line: String, cfg: AnalyzerConfig): Array[String] =
    Analyzer.analyze(line, cfg.copy(regex = true))
}
