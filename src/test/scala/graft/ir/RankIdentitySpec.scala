package graft.ir

import graft.SparkSpec

/** Rank-identity of the Spark serving path vs the oracle evaluator on the 13
  * reference bot queries (SURVEY.md §5.2/§5.3-2): identical docIds in
  * identical order (docId tie-break) and scores to 1e-9, for OR and AND
  * modes and both scorers; plus WAND == exact. */
class RankIdentitySpec extends SparkSpec {

  private val K = 10

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq

  private def assertIdentical(
      got: Seq[(Long, Double)], want: Seq[(Long, Double)], ctx: String): Unit = {
    assert(got.map(_._1) == want.map(_._1), s"$ctx: docId order")
    got.zip(want).foreach { case ((d, gs), (_, ws)) =>
      assert(math.abs(gs - ws) < 1e-9, s"$ctx: score doc $d: $gs vs $ws")
    }
  }

  private def runSet(view: IndexView, oracle: Oracle.OracleIndex, ctx: String): Unit = {
    val searcher = new Searcher(view)
    Fixtures.referenceQueries.distinct.foreach { q =>
      assertIdentical(hits(searcher.search(spark, q, K, Or, TfIdfCosine)),
        oracle.evaluateCosine(q, Or).take(K), s"$ctx cosine-OR '$q'")
      assertIdentical(hits(searcher.search(spark, q, K, And, TfIdfCosine)),
        oracle.evaluateCosine(q, And).take(K), s"$ctx cosine-AND '$q'")
      assertIdentical(hits(searcher.search(spark, q, K, Or, Bm25)),
        oracle.evaluateBm25(q, Or).take(K), s"$ctx bm25-OR '$q'")
      assertIdentical(hits(searcher.search(spark, q, K, And, Bm25)),
        oracle.evaluateBm25(q, And).take(K), s"$ctx bm25-AND '$q'")
      assertIdentical(hits(searcher.searchBm25Wand(spark, q, K)),
        oracle.evaluateBm25(q, Or).take(K), s"$ctx bm25-WAND '$q'")
    }
  }

  test("rank identity on tp2 (the reference corpus shape)") {
    val view = IndexBuilder.build(spark, Fixtures.tp2Turns(spark))
    runSet(view, Oracle.index(Fixtures.tp2Corpus), "tp2")
  }

  test("rank identity on synthetic multi-turn corpus (200 convs, skew, accents)") {
    val cfg = BuildConfig(saltRange = 64)
    val view = IndexBuilder.build(spark, Fixtures.synthTurns(spark, 200), cfg)
    runSet(view, Oracle.index(Fixtures.synthCorpus(spark, 200), cfg), "synth")
  }

  test("empty and fully-OOV queries short-circuit to empty results") {
    val view = IndexBuilder.build(spark, Fixtures.tp2Turns(spark))
    val s = new Searcher(view)
    assert(s.search(spark, "", K).count() == 0)
    assert(s.search(spark, "¡¿ de la", K).count() == 0)
    assert(s.search(spark, "primera consulta", K).count() == 0) // OOV
    assert(s.searchBm25Wand(spark, "", K).count() == 0)
  }
}
