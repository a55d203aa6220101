package graft.ir

import graft.SparkSpec

/** Pruning-soundness fuzz (SURVEY.md §5.3-4): block-max WAND top-k must
  * equal the exact BM25 top-k for randomized queries over a skewed corpus —
  * seeded, so failures reproduce. */
class WandFuzzSpec extends SparkSpec {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("WAND == exact BM25 on 30 random queries, k in {1,3,10}") {
    // small saltRange → many blocks per hot term → pruning actually engages
    val cfg = BuildConfig(saltRange = 32)
    val view = IndexBuilder.build(spark, Fixtures.synthTurns(spark, 250), cfg)
    val searcher = new Searcher(view)
    val vocab = view.termDict.collect().map(_.term)
    (0 until 30).foreach { qi =>
      val nTerms = 1 + (mix(qi) & 0x7FFFFFFF).toInt % 5
      val terms = (0 until nTerms).map { ti =>
        vocab((mix(qi * 31 + ti) & 0x7FFFFFFF).toInt % vocab.length)
      }
      val q = terms.mkString(" ")
      val k = Seq(1, 3, 10)(qi % 3)
      val exact = searcher.search(spark, q, k, Or, Bm25)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      // exactCutover = 0 forces the pruning phases (the fuzz corpus is far
      // below the production cutover, which would serve the exact path)
      val wand = searcher.searchBm25Wand(spark, q, k, exactCutover = 0L)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(wand.map(_._1).toSeq == exact.map(_._1).toSeq, s"q='$q' k=$k doc order")
      wand.zip(exact).foreach { case ((d, ws), (_, es)) =>
        assert(math.abs(ws - es) < 1e-9, s"q='$q' k=$k doc=$d score")
      }
    }
  }

  test("AND block-skip == oracle AND on 20 random multi-term queries") {
    val cfg = BuildConfig(saltRange = 32)
    val view = IndexBuilder.build(spark, Fixtures.synthTurns(spark, 250), cfg)
    val oracle = Oracle.index(Fixtures.synthCorpus(spark, 250), cfg)
    val searcher = new Searcher(view)
    val vocab = view.termDict.collect().map(_.term).sorted
    (0 until 20).foreach { qi =>
      val nTerms = 2 + (mix(1000 + qi) & 0x7FFFFFFF).toInt % 4
      val terms = (0 until nTerms).map { ti =>
        vocab((mix(qi * 53 + ti) & 0x7FFFFFFF).toInt % vocab.length)
      }
      val q = terms.mkString(" ")
      val got = searcher.search(spark, q, 10, And, Bm25)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val want = oracle.evaluateBm25(q, And).take(10)
      assert(got.map(_._1) == want.map(_._1), s"AND q='$q' docs")
      got.zip(want).foreach { case ((d, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-9, s"AND q='$q' doc=$d score")
      }
    }
  }

  test("batch == single on 20 random query sets, both scorers") {
    val view = IndexBuilder.build(spark, Fixtures.synthTurns(spark, 200))
    val searcher = new Searcher(view)
    val vocab = view.termDict.collect().map(_.term).sorted
    (0 until 4).foreach { bi =>
      // 5 random queries per batch, 1–4 terms each, with repeats possible
      // (query-tf > 1) — scored in ONE job, then compared per query
      val batch = (0 until 5).map { qi =>
        val n = 1 + (mix(bi * 101 + qi) & 0x7FFFFFFF).toInt % 4
        val terms = (0 until n).map { ti =>
          vocab((mix(bi * 997 + qi * 31 + ti) & 0x7FFFFFFF).toInt % vocab.length)
        }
        s"q$qi" -> terms.mkString(" ")
      }
      // cutovers: the production default (unpruned at this corpus size) AND
      // exactCutover = 0, which forces the per-query block-max pruning of
      // the shared decode — both must equal single-query serving exactly
      for (scorer <- Seq[Scorer](Bm25, TfIdfCosine);
           cutover <- if (scorer == Bm25) Seq(Long.MaxValue, 0L) else Seq(Long.MaxValue)) {
        val got = searcher.searchBatch(spark, batch, 10, scorer, cutover)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
          .groupBy(_._1)
        batch.foreach { case (qid, text) =>
          val single = searcher.search(spark, text, 10, Or, scorer)
            .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
          val rows = got.getOrElse(qid, Array.empty).sortBy(_._4)
          assert(rows.map(_._2).toSeq == single.map(_._1),
            s"batch $bi $scorer cutover=$cutover '$text': doc order")
          rows.map(_._3).zip(single.map(_._2)).foreach { case (g, w) =>
            assert(math.abs(g - w) < 1e-9,
              s"batch $bi $scorer cutover=$cutover '$text': score")
          }
        }
      }
    }
  }
}
