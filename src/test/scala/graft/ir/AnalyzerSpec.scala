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

  test("determinism + index/query symmetry: re-analysis of joined terms is stable") {
    val s = "El Software Libre favoreció la comunicación entre países"
    val once = Analyzer.analyze(s, cfg)
    val twice = Analyzer.analyze(once.mkString(" "), cfg)
    assert(once.toSeq == twice.toSeq)
  }
}
