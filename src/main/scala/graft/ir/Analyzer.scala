package graft.ir

import java.text.Normalizer

/**
 * Deterministic lexical analyzer, shared verbatim between index build and
 * query normalization (the rank-identity contract requires bit-identical
 * tokenization on both sides).
 *
 * Semantics follow the reference pipeline
 * (`/root/reference/IR_server/IR_python/modulos/LexAnalyser.py:37-110` and the
 * query-side mirror `IR_server/java_src/Model/IRNormalizer.java:21-22,53-100`):
 *
 *   1. NFKD-decompose and drop combining marks (accent strip)
 *   2. lowercase
 *   3. delete punctuation (`¿¡` + ASCII punctuation) and a fixed
 *      "weird chars" set
 *   4. split on whitespace
 *   5. drop stopwords (list itself normalized with the same tokenizer)
 *   6. keep terms with minLen <= length <= maxLen
 *
 * Regex special-token extraction and Snowball stemming are OFF by default
 * (optional in the reference config; its query side ships with them off, so
 * the default profile preserves the reference's index/query symmetry —
 * SURVEY.md §1.3). Both are available: `regex = true` runs the P8 extractor
 * pre-pass (RegexTokens), `stem = Some("en"|"es")` stems after the stopword
 * filter and before the length filter, the reference's exact ordering
 * (LexAnalyser.py:52-60). Because analyze() is shared verbatim by build and
 * query sides, enabling either keeps symmetry automatically.
 *
 * Pure function of (config, input); no locale, wall-clock, or partition-order
 * dependence, so it is safe inside distributed UDFs at any parallelism.
 */
final case class AnalyzerConfig(
    stopwords: Set[String],
    minLen: Int,
    maxLen: Int,
    stem: Option[String] = None,
    regex: Boolean = false) extends Serializable

object Analyzer extends Serializable {

  /** `¡¿` + ASCII punctuation, as in the reference normalizer constant. */
  val Punctuation: String = "¡¿!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  /** Fixed non-ASCII garbage set removed by the reference normalizer. */
  val WeirdChars: String =
    "§âÂ¢«»­±¬ºï" +
      "©®Ÿ€¾°“”·—’" +
      "‘–Ã¼ü"

  private val removeSet: Set[Char] = (Punctuation + WeirdChars).toSet

  /** Small deterministic Spanish stopword subset for the default profile
    * (tests embed their own; the full reference list is config-supplied). */
  val SpanishStopwords: Set[String] = Set(
    "de", "la", "que", "el", "en", "los", "se", "las", "por", "un",
    "para", "con", "una", "su", "del", "al", "lo", "como", "mas",
    "pero", "sus", "les", "este", "esta", "entre", "cuando", "muy",
    "sobre", "tambien", "hasta", "hay", "donde", "quien", "desde",
    "nos", "durante", "uno", "ni", "contra", "ese", "eso", "habia",
    "ante", "ellos", "esto", "antes", "algunos", "unos", "otro",
    "otras", "otra", "tanto", "esa", "estos", "mucho", "nada", "muchos",
    "cual", "sea", "poco", "ella", "estar", "haber", "estas", "estaba",
    "estamos", "algunas", "algo", "nosotros")

  /** English function-word subset (for the sfN `documents` corpus profile
    * and the language-ID heuristic). */
  val EnglishStopwords: Set[String] = Set(
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "was",
    "for", "on", "are", "as", "with", "his", "they", "at", "be",
    "this", "have", "from", "or", "one", "had", "by", "but", "not",
    "what", "all", "were", "when", "your", "can", "said")

  /** Reference parity profile (Spanish corpus): lowercase + NFKD strip +
    * punct/weird removal + whitespace split + stopwords + length [3,23]
    * (`IR_server/IR_python/config.ini.example:14-21`, stem/regex off). */
  val Reference: AnalyzerConfig = AnalyzerConfig(SpanishStopwords, 3, 23)

  /** Profile for the driver's synthetic English `documents` corpus: no
    * stopword removal (keeps the DuckDB oracle SQL trivially equivalent),
    * same length filter. */
  val Plain: AnalyzerConfig = AnalyzerConfig(Set.empty, 3, 23)

  /** NFKD decompose, drop combining marks. Mirror of the reference's
    * `unicodedata.normalize('NFKD', s)` + combining filter. */
  def stripAccents(s: String): String = {
    val nfkd = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(nfkd.length)
    var i = 0
    while (i < nfkd.length) {
      val c = nfkd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Normalize + whitespace-tokenize (reference `tokenize`): accent strip,
    * lowercase, remove punctuation + weird chars, split on whitespace runs.
    *
    * Pure-ASCII input takes a single-pass zero-copy path: NFKD is the
    * identity on ASCII, lowercasing is `+32`, the weird-char set is entirely
    * non-ASCII, and `\s` is the 6 ASCII whitespace chars — so the fast path
    * is semantics-identical (AnalyzerSpec asserts equality against the
    * general path on ASCII inputs). The win is allocation, not just cycles:
    * the general path materializes 4 intermediate strings per line, and in
    * the index build this UDF dominates the tf stage — allocation here is
    * shared-heap GC pressure that directly caps thread-scaling efficiency. */
  def tokenize(line: String): Array[String] = {
    if (line == null) return Array.empty
    var i = 0
    var ascii = true
    while (ascii && i < line.length) {
      if (line.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) tokenizeAscii(line) else tokenizeGeneral(line)
  }

  /** ASCII chars the normalizer deletes (the removeSet restricted to 7-bit). */
  private val asciiRemove: Array[Boolean] =
    Array.tabulate(128)(c => removeSet.contains(c.toChar))

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r') // exactly Java regex \s

  private def tokenizeAscii(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      if (isAsciiSpace(c0)) {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else {
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        if (!asciiRemove(c)) sb.append(c)
      }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  private[ir] def tokenizeGeneral(line: String): Array[String] = {
    // Locale.ROOT, not the JVM default (ADVICE r4): under a tr/az default
    // locale toLowerCase("TITLE") is "tıtle", which would diverge from the
    // ASCII fast path's '+32' lowering WITHIN one corpus (a line's path
    // depends on whether it happens to contain a non-ASCII char) and break
    // the analyzer's index/query rank-identity contract
    val stripped = stripAccents(line).toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(stripped.length)
    var i = 0
    while (i < stripped.length) {
      val c = stripped.charAt(i)
      if (!removeSet.contains(c)) sb.append(c)
      i += 1
    }
    sb.toString.split("\\s+").filter(_.nonEmpty)
  }

  /** Full analysis, reference ordering (LexAnalyser.analyse): optional regex
    * pre-pass → tokenize → stopword filter → optional stem → length filter →
    * regex special terms appended unfiltered. */
  def analyze(line: String, cfg: AnalyzerConfig): Array[String] = {
    if (line == null) return Array.empty
    val (special, rest) =
      if (cfg.regex) { val e = RegexTokens(line); (e.terms, e.remaining) }
      else (Seq.empty[String], line)
    val kept = tokenize(rest).filter(t => !cfg.stopwords.contains(t))
    val stemmed = cfg.stem match {
      case Some(lang) => val f = Stemmer(lang); kept.map(f)
      case None => kept
    }
    val filtered = stemmed.filter(t =>
      t.length >= cfg.minLen && t.length <= cfg.maxLen)
    if (special.isEmpty) filtered else filtered ++ special
  }

  def analyze(line: String): Array[String] = analyze(line, Reference)
}
