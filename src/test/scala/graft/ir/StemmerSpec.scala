package graft.ir

import graft.SparkSpec

class StemmerSpec extends SparkSpec {

  test("Porter English goldens (examples from the published algorithm)") {
    val golden = Seq(
      // step 1a/1b/1c
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      // step 2
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "hopefulness" -> "hope", "callousness" -> "callous",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      // step 4/5
      "allowance" -> "allow", "inference" -> "infer",
      "adjustable" -> "adjust", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun",
      "effective" -> "effect", "generalizations" -> "gener",
      "oscillators" -> "oscil", "rate" -> "rate", "controll" -> "control")
    golden.foreach { case (in, want) =>
      assert(Stemmer.english(in) == want, s"english('$in')")
    }
  }

  test("Spanish stems unify inflectional families") {
    val families = Seq(
      Seq("gato", "gatos", "gata", "gatas"),
      Seq("canción", "canciones"),
      // NOTE rápidamente stems to "rapid" (step 1), while rápido/rápida
      // lose -ido/-ida in step 2 → "rap"; the real Snowball conflates the
      // adverb differently from the adjective too, so only the o/a pair is
      // asserted as one family
      Seq("rápido", "rápida"),
      Seq("canto", "cantar", "cantando", "cantaron", "cantamos"),
      Seq("librería", "librerías"))
    families.foreach { fam =>
      val stems = fam.map(Stemmer.spanish).distinct
      assert(stems.size == 1, s"family $fam split into $stems")
    }
    // distinct concepts stay distinct
    assert(Stemmer.spanish("gato") != Stemmer.spanish("canción"))
    // output is accent-free (terms must survive the analyzer unchanged)
    assert(Stemmer.spanish("días") == Stemmer.spanish("dias").map(identity))
  }

  test("stemmers are total, deterministic and non-expanding on fuzz input") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // arbitrary strings (incl. unicode, empty, digits): the analyzer only
    // feeds whitespace-free lowercase tokens, but a UDF must never throw on
    // anything — fuzz the raw surface
    val gen = Gen.oneOf(
      Gen.alphaLowerStr,
      Gen.asciiPrintableStr.map(_.filter(!_.isWhitespace)),
      Gen.listOf(Gen.oneOf("áéíóúüñ日本語綜合".toSeq)).map(_.mkString))
    var seed = Seed(42L)
    (0 until 2000).foreach { _ =>
      val r = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      for (f <- Seq(Stemmer.english, Stemmer.spanish)) {
        val out = f(r)
        assert(out == f(r), s"non-deterministic on '$r'")
        assert(out.length <= r.length + 1, s"expanded '$r' -> '$out'")
      }
    }
  }

  test("stemmed profile: analyzer ordering matches the reference (stem before length filter)") {
    // 'ríos' stems to 'ri' (2 chars) — the length filter must apply AFTER
    // stemming (LexAnalyser.py:52-60), so a post-stem short term is dropped
    // even though the surface form passed
    val cfg = AnalyzerConfig(Set.empty, 3, 23, stem = Some("es"))
    val out = Analyzer.analyze("gatos corriendo", cfg).toSeq
    assert(out == Seq(Stemmer.spanish("gatos"), Stemmer.spanish("corriendo")))
    assert(Analyzer.analyze("gatos", cfg).toSeq ==
      Analyzer.analyze("gato", cfg).toSeq) // family-unified at analyzer level
  }

  test("stemmed index keeps index/query symmetry: inflected query matches") {
    import spark.implicits._
    val cfg = BuildConfig(analyzer =
      AnalyzerConfig(Set.empty, 2, 23, stem = Some("es")))
    val turns = Seq(
      Turn("c1", 0, "user", "los gatos cantaron fuerte", null, new java.sql.Timestamp(0)),
      Turn("c2", 0, "user", "una biblioteca tranquila", null, new java.sql.Timestamp(0)))
      .toDF()
    val view = IndexBuilder.build(spark, turns, cfg)
    val s = new Searcher(view)
    // singular query form finds the plural document through the shared stem
    val hits = s.search(spark, "gato cantar", 10, Or, Bm25).collect()
    assert(hits.map(_.getString(1)).toSeq == Seq("c1"))
  }

  test("stem/regex flags round-trip through the persisted index config") {
    val dir = graft.SparkSpec.tmpDir("stem-cfg")
    import spark.implicits._
    val cfg = BuildConfig(analyzer =
      AnalyzerConfig(Set("de"), 2, 23, stem = Some("es"), regex = true))
    val turns = Seq(
      Turn("c1", 0, "user", "los gatos de Juan Pérez", null, new java.sql.Timestamp(0)))
      .toDF()
    IndexStore.buildAndSave(spark, turns, dir, cfg)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.cfg == cfg, s"config drift: ${loaded.cfg}")
    // regex special term indexed verbatim (bypasses stem + filters)
    assert(loaded.termDict.collect().map(_.term).contains("Juan Perez"))
  }
}
