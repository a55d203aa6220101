package graft.ir

import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  private val cfg = Analyzer.Reference

  test("accent strip via NFKD") {
    assert(Analyzer.stripAccents("canción") == "cancion")
    assert(Analyzer.stripAccents("Ñandú") == "Nandu")
    assert(Analyzer.analyze("canción país", cfg).toSeq == Seq("cancion", "pais"))
  }

  test("punctuation incl. inverted marks and weird chars removed") {
    assert(Analyzer.analyze("¡LIBRE! ¿pais? «tecnología»", cfg).toSeq ==
      Seq("libre", "pais", "tecnologia"))
    assert(Analyzer.tokenize("a€b°c“d”e").toSeq == Seq("abcde"))
  }

  test("length filter [3,23]") {
    val terms = Analyzer.analyze("ab abc " + "x" * 23 + " " + "y" * 24, cfg)
    assert(terms.toSeq == Seq("abc", "x" * 23))
  }

  test("stopwords dropped after normalization") {
    // 'de'/'la' are stopwords but too short anyway; 'para'/'cuando' exercise it
    assert(Analyzer.analyze("para cuando software", cfg).toSeq == Seq("software"))
  }

  test("whitespace runs and empty input") {
    assert(Analyzer.analyze("  software   libre  ", cfg).toSeq ==
      Seq("software", "libre"))
    assert(Analyzer.analyze("", cfg).isEmpty)
    assert(Analyzer.analyze(null, cfg).isEmpty)
    assert(Analyzer.analyze("¡¿!?", cfg).isEmpty)
  }

  test("ASCII fast path equals the general path on fuzzed ASCII inputs") {
    // data-defined PRNG strings over the full 7-bit range, heavy on the
    // interesting chars (whitespace runs, punctuation, case boundaries)
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val pool = "aAzZ09 \t\n\r.,;:!?¡".filter(_ < 0x80) + "'\"()[]{}$%&#@^_`|~ -/\\<>=+*"
    for (seed <- 0 until 200) {
      val len = (math.abs(mix(seed.toLong)) % 60).toInt
      val s = new String(Array.tabulate(len)(i =>
        pool((math.abs(mix(seed * 1000L + i)) % pool.length).toInt)))
      assert(Analyzer.tokenize(s).toSeq == Analyzer.tokenizeGeneral(s).toSeq,
        s"fast/general divergence on ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
    // boundary chars around the \s class and the ASCII/non-ASCII frontier
    for (s <- Seq("a\bb", "a\u000Bb", "a\u000Eb", "A~z", "\u007F", "x\u0080y",
        " \t\r\n ", "x  y", "")) {
      assert(Analyzer.tokenize(s).toSeq == Analyzer.tokenizeGeneral(s).toSeq,
        s"divergence on ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("determinism + index/query symmetry: re-analysis of joined terms is stable") {
    val s = "El Software Libre favoreció la comunicación entre países"
    val once = Analyzer.analyze(s, cfg)
    val twice = Analyzer.analyze(once.mkString(" "), cfg)
    assert(once.toSeq == twice.toSeq)
  }
}
