package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ir.{Analyzer, AnalyzerConfig}

/** The native tokenizer generator must be indistinguishable from
  * `explode(analyzeUdf(text))` for every stem-free, regex-free profile —
  * the r7 optimization that removed the UDF hop from the tf stage. */
class TokenizeTextSpec extends SparkSpec {

  private val lines = Seq(
    "Hello, World! the quick BROWN fox",
    "  tabs\tand\nnewlines\rhere  ",
    "comas, puntos. (parens) [brackets] {braces} fin",
    "¡Hola! ¿Qué tal? café niño AÑEJO",          // non-ASCII: general path
    "mixed ascii y acentuación in ONE line",
    "a bb ccc dddd eeeee",                        // length-filter edges
    "!!! ... ???",                                // punctuation-only tokens
    "word-with-dashes under_score slash/slash",
    "",                                           // empty line
    "x" * 30 + " normal tail",                    // over-maxLen token
    "the and of to in is that for on with")       // stopword-heavy

  private def viaUdf(cfg: AnalyzerConfig) = {
    val u = udf((s: String) => Analyzer.analyze(s, cfg))
    spark.createDataFrame(lines.zipWithIndex.map { case (t, i) => (i, t) })
      .toDF("id", "text")
      .select(col("id"), explode(u(col("text"))).as("term"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
  }

  private def viaGen(cfg: AnalyzerConfig) =
    spark.createDataFrame(lines.zipWithIndex.map { case (t, i) => (i, t) })
      .toDF("id", "text")
      .select(col("id"), TokenizeText.column(col("text"), cfg))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq

  test("generator == udf tokenization for Plain and Reference profiles") {
    for (cfg <- Seq(Analyzer.Plain, Analyzer.Reference,
        AnalyzerConfig(Set("quick", "normal"), 2, 8))) {
      assert(viaGen(cfg) == viaUdf(cfg), s"profile $cfg diverged")
    }
  }

  test("generator == udf on pseudo-random ascii/mixed fuzz lines") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh ABZ.,!?-_09\téñ " // é ñ force general path sometimes
    val fuzz = (1 to 300).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val u = udf((s: String) => Analyzer.analyze(s, Analyzer.Reference))
    val base = spark.createDataFrame(fuzz.zipWithIndex.map { case (t, i) => (i, t) })
      .toDF("id", "text")
    val a = base.select(col("id"), explode(u(col("text"))).as("term"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val b = base.select(col("id"),
        TokenizeText.column(col("text"), Analyzer.Reference))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(a == b)
  }
}
