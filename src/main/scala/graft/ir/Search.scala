package graft.ir

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

sealed trait QueryMode
case object Or extends QueryMode  // disjunctive union-accumulate (reference serving path)
case object And extends QueryMode // conjunctive posting intersection

sealed trait Scorer
case object TfIdfCosine extends Scorer // reference parity (SURVEY.md §1.4)
case object Bm25 extends Scorer        // north-rule production scorer

/**
 * Query-side engine: analyze → vocabulary lookup (OOV drop) → postings scan
 * with predicate pushdown on term_id → block decode → per-doc score
 * aggregation → threshold → top-k (TakeOrderedAndProject) → doc resolution.
 *
 * One Spark job, two shuffles (doc agg + top-k merge) — the Spark-native
 * reshape of the reference's client→broker→server→GPU hop chain
 * (SURVEY.md §3.1).
 *
 * Scoring semantics:
 *  - tf-idf cosine: score(d,q) = Σ_t w(t,d)·w(t,q) / (‖q‖·‖d‖) with
 *    w(t,d) = (tf/maxtf_d)·idf_t, w(t,q) = (qtf/maxqtf)·idf_t,
 *    idf = log10(N/df); zero divisor → 0; float query-tf division (the
 *    Python ground-truth path, ir_manager.py:69-96 — see SURVEY.md §1.4 on
 *    the C-side integer-division divergence).
 *  - BM25: Σ_t qtf_t · idf25_t · (k1+1)tf / (tf + k1(1-b+b·dl/avgdl)),
 *    idf25 = ln((N-df+0.5)/(df+0.5)+1).
 */
class Searcher(index: IndexView) extends Serializable {

  import index.cfg

  /** Query term weights after analysis + OOV drop. */
  private[graft] case class QueryTerm(
      termId: Long, qtf: Int, df: Long, idf: Double, bm25Idf: Double,
      qw: Double,    // tf-idf: w(t,q) = (qtf/maxqtf)·idf(t) — 0 when idf=0 (df==N)
      qwIdf: Double, // tf-idf: w(t,q)·idf(t) — per-tf-unit cosine numerator factor
      qb: Double)    // bm25:  qtf·idf25(t)

  private[graft] def queryTerms(spark: SparkSession, query: String): Seq[QueryTerm] = {
    val terms = Analyzer.analyze(query, cfg.analyzer)
    if (terms.isEmpty) return Seq.empty
    val freq: Map[String, Int] =
      terms.groupBy(identity).map { case (t, g) => t -> g.length }
    // J2/P9: O(1) lookup against the driver-resident vocabulary (the
    // reference loads it once at server start, Model/Vocabulary.java:33-42);
    // above the size guard, a pushed-filter dictionary scan. Terms missing
    // from the vocabulary are dropped exactly as the reference drops them
    // (Model/Query.java:33-41).
    val rows: Seq[TermStat] = index.termLookup match {
      case Some(dict) => freq.keys.iterator.flatMap(dict.get).toSeq
      case None => index.termDict
        .filter(col("term").isin(freq.keys.toSeq: _*))
        .collect().toSeq
    }
    if (rows.isEmpty) return Seq.empty
    val maxQtf = freq.values.max.toDouble
    rows.sortBy(_.term_id).map { ts =>
      val qtf = freq(ts.term)
      val wq = (qtf / maxQtf) * ts.idf
      QueryTerm(ts.term_id, qtf, ts.df, ts.idf, ts.bm25_idf,
        wq, wq * ts.idf, qtf * ts.bm25_idf)
    }
  }

  /** Decode a block set to (term_id, doc_id, tf) rows — via the native
    * DecodeBlock generator, so postings stay in Tungsten rows instead of
    * round-tripping through Block case-class objects per query. */
  private[graft] def decodeBlocks(blocks: Dataset[Block]): DataFrame =
    graft.functions.DecodeBlock.postings(blocks.toDF())

  /** Decoded candidate postings for a term set: (doc_id, term_id, tf). */
  private[graft] def decodedPostings(
      spark: SparkSession, termIds: Seq[Long]): DataFrame =
    decodeBlocks(index.postings.filter(col("term_id").isin(termIds: _*)))

  /** Above this many blocks the rare term's interval list is not collected
    * and AND skip pruning is disabled (≈1M docs at BlockSize 128). */
  private[graft] val AndSkipMaxBlocks: Long = 8192L

  /** Up to this many query terms BM25 scores through per-term conditional
    * sums (flat codegen agg); longer queries take the collect_list fold
    * (agg row width stays bounded). */
  private[graft] val ScoreColumnsMaxTerms: Int = 16

  /** BM25 accumulation grid: every per-term contribution is quantized to a
    * scaled-long fixed point at the 1e-15 grid and summed in exact 64-bit
    * integer arithmetic. Long addition is associative and commutative, so
    * the single-query fixed-order fold, the long-query array fold and the
    * batch path's hash-aggregate `sum` all produce the IDENTICAL score for
    * the same postings in ANY execution order — bit-stable run to run (a
    * plain double sum drifts at ulp level with shuffle arrival order) and
    * bit-equal batch vs single (RankIdentitySpec). This replaces the r4
    * decimal(30,15) grid — same determinism contract, but the accumulation
    * stays a primitive-long codegen HashAggregate instead of an object-path
    * Decimal add (the source of the r4 ~30% serving-latency regression,
    * VERDICT r4 #1). The 1e-15 quantum is ~1e-17 relative on BM25 scores
    * (invisible at the oracle's 1e-6 rounding); capacity is |score| ≤
    * 2^63/1e15 ≈ 9.2e3, far above any BM25 total (idf25 ≤ ln N + 1). */
  private[graft] val ScoreScale: Double = 1e15
  /** floor(x·1e15 + ½) as a codegen long — the one shared quantizer; batch
    * and single-query paths MUST route every contribution through it. */
  private def qfix(c: Column): Column = floor(c * ScoreScale + lit(0.5))

  /**
   * The k most promising blocks' (first_doc_id, last_doc_id) intervals per
   * term — the WAND θ phase's "where do the big scores live" metadata
   * lookup, served from the view's driver-resident cache (VERDICT r5 #4:
   * these are index-immutable between appends, so paying a Spark job per
   * query for them was the θ path's residual cost). Blocks are ranked by
   * the idf-free BM25 saturation bound (bm25_idf is a positive per-term
   * constant, so the per-term ranking is identical to the full block bound)
   * with a deterministic (bound desc, first_doc_id asc) tie-break; missing
   * terms are computed in ONE metadata-only job. Returned arrays are sorted
   * by first_doc_id.
   */
  private[graft] def topBlockIntervals(
      termIds: Seq[Long], k: Int): Map[Long, Array[(Long, Long)]] = {
    val cache = index.thetaIntervalCache
    val missing = termIds.distinct.filterNot(t => cache.containsKey((t, k)))
    if (missing.nonEmpty) {
      val bk1 = cfg.k1; val bb = cfg.b
      val bAvgdl = if (index.meta.avgdl > 0) index.meta.avgdl else 1.0
      val satBound = (col("max_tf") * (bk1 + 1)) /
        (col("max_tf") + lit(bk1) * (lit(1 - bb) + lit(bb / bAvgdl) * col("min_dl")))
      val got: Map[Long, Array[(Long, Long)]] = index.postings.toDF()
        .filter(col("term_id").isin(missing: _*))
        .withColumn("bound", satBound)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("term_id")
            .orderBy(col("bound").desc, col("first_doc_id").asc)))
        .filter(col("rn") <= k)
        .select("term_id", "first_doc_id", "last_doc_id")
        .collect()
        .groupBy(_.getLong(0))
        .map { case (tid, rs) =>
          tid -> rs.map(r => (r.getLong(1), r.getLong(2))).sorted
        }
      missing.foreach { t =>
        index.thetaCachePutBounded((t, k), got.getOrElse(t, Array.empty[(Long, Long)]))
      }
    }
    termIds.distinct.map(t => t -> cache.get((t, k))).toMap
  }

  /**
   * J4 block-skip for AND queries — the Spark form of the reference's √df
   * skip-pointer leapfrog (modulos/Postings.py:376-411): collect the rarest
   * term's block ranges (disjoint, docId-ascending: salt ranges are ordered
   * and append batches start past the old max), then decode other terms'
   * blocks only where [first_doc_id, last_doc_id] overlaps one of them. Any
   * doc in a skipped block is absent from the rare term's postings, so it
   * can never reach match-count == |q| — pruning is lossless. A
   * stopword-grade term AND a rare term now decodes O(df_rare/BlockSize)
   * hot blocks instead of the hot term's entire posting list.
   */
  private[graft] def andSurvivorBlocks(
      spark: SparkSession, qts: Seq[QueryTerm]): Option[Dataset[Block]] = {
    val rare = qts.minBy(q => (q.df, q.termId))
    if (rare.df / Codec.BlockSize + 1 > AndSkipMaxBlocks) return None
    val intervals = index.postings
      .filter(col("term_id") === rare.termId)
      .select("first_doc_id", "last_doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    if (intervals.isEmpty) return None // dict/postings drift: fall back
    val starts = intervals.map(_._1)
    val ends = intervals.map(_._2) // ascending too (disjoint, start-sorted)
    val others = qts.map(_.termId).filter(_ != rare.termId)
    val overlaps = udf((first: Long, last: Long) => {
      var lo = 0
      var hi = starts.length // lo → first interval with start > last
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (starts(m) <= last) lo = m + 1 else hi = m
      }
      lo > 0 && ends(lo - 1) >= first
    })
    Some(index.postings.filter(
      col("term_id") === rare.termId ||
        (col("term_id").isin(others: _*) &&
          overlaps(col("first_doc_id"), col("last_doc_id")))))
  }

  def search(
      spark: SparkSession,
      query: String,
      k: Int,
      mode: QueryMode = Or,
      scorer: Scorer = TfIdfCosine): DataFrame = {
    val qts = queryTerms(spark, query)
    val pruned =
      if (mode == And && qts.length > 1)
        andSurvivorBlocks(spark, qts).map(decodeBlocks)
      else None
    scoreTerms(spark, qts, k, mode, scorer, pruned)
  }

  /** Shared scoring tail; `onlyBlocks` lets the WAND path substitute a
    * pruned block set. */
  private def scoreTerms(
      spark: SparkSession,
      qts: Seq[QueryTerm],
      k: Int,
      mode: QueryMode,
      scorer: Scorer,
      prunedDecoded: Option[DataFrame]): DataFrame = {
    import spark.implicits._
    require(scorer != TfIdfCosine || cfg.cosineNorms,
      "index was built with cosineNorms=false (BM25-only maintenance mode); " +
        "tf-idf cosine scoring needs a norms rebuild")
    val empty = spark.emptyDataset[Hit].toDF()
    if (qts.isEmpty) return empty // Query.isEmptyOfTerms short-circuit

    val qwIdf = qts.map(q => q.termId -> q.qwIdf).toMap
    val qb = qts.map(q => q.termId -> q.qb).toMap
    // w(t,q) is carried on QueryTerm, never recovered as qwIdf/idf: a query
    // term present in EVERY doc has idf = log10(N/N) = 0, and 0/0 = NaN would
    // poison qNorm (NaN sorts above all doubles in Spark SQL, so it would
    // both survive the score > 0 filter and win the top-k). Such a term
    // contributes w = 0, exactly as the reference (ir_manager.py:69-96).
    val qNorm = math.sqrt(qts.map(q => q.qw * q.qw).sum)
    if (qNorm == 0.0 && scorer == TfIdfCosine) return empty

    val qwIdfMap = typedLit(qwIdf)
    val qbMap = typedLit(qb)

    val decoded = prunedDecoded.getOrElse(
      decodedPostings(spark, qts.map(_.termId)))

    val k1 = cfg.k1
    val b = cfg.b
    val avgdl = if (index.meta.avgdl > 0) index.meta.avgdl else 1.0

    // J1: per-doc union accumulation.
    //  - Cosine: the numerator factors as (1/maxtf_d)·Σ_t qwIdf_t·tf, so the
    //    agg is a plain codegen'd sum and (max_tf, norm, conv_id) join in
    //    once per MATCHED doc after it.
    //  - BM25 needs doc_len per doc, so the (≤ |q|-element) per-doc
    //    contribution list rides through the agg and a codegen'd
    //    higher-order `aggregate` folds it after the doc_stats join. (The
    //    seemingly-cheaper "join doc_len BEFORE the agg and sum per-posting
    //    contributions" variant measured ~30% SLOWER at p50: every decoded
    //    posting pays a broadcast-hash probe and a wider agg row, vs. this
    //    shape aggregating narrow (long, int) rows first and joining only
    //    the matched docs — see BENCH/BASELINE.md round 2.)
    val scored0 = scorer match {
      case TfIdfCosine =>
        // `nterms` exists only for And-mode conjunction filtering; Or mode
        // (the serving default) keeps the hot agg one buffer column narrower
        val grouped = decoded
          .withColumn("c", element_at(qwIdfMap, col("term_id")) * col("tf"))
          .groupBy("doc_id")
        val matched = mode match {
          case Or  => grouped.agg(sum(col("c")).as("cnum"))
          case And => grouped
            .agg(sum(col("c")).as("cnum"), count(lit(1)).as("nterms"))
            .filter(col("nterms") === qts.length)
        }
        matched
          .join(index.docStats.select("doc_id", "conv_id", "max_tf", "norm").hint("merge"), "doc_id")
          .withColumn("score",
            when(col("max_tf") === 0 || col("norm") === 0.0, 0.0)
              .otherwise(col("cnum") / col("max_tf") / (lit(qNorm) * col("norm"))))
      case Bm25 if qts.length <= ScoreColumnsMaxTerms =>
        // per-term conditional sums: the whole agg is a codegen'd
        // HashAggregate over numeric columns (collect_list forces the
        // slower ObjectHashAggregate), and the BM25 fold becomes a flat
        // |q|-branch codegen expression after the stats join. ~25% off
        // stage-2 task time at p50 on the 400k-conv synth index.
        val tfAggs = qts.map(q =>
          sum(when(col("term_id") === q.termId, col("tf"))).as(s"tf_${q.termId}"))
        val grouped = decoded.groupBy("doc_id")
        val matched = mode match {
          case Or  => grouped.agg(tfAggs.head, tfAggs.tail: _*)
          case And => grouped
            .agg(count(lit(1)).as("nterms"), tfAggs: _*)
            .filter(col("nterms") === qts.length)
        }
        val sat = qts.map { q =>
          val tf = col(s"tf_${q.termId}")
          when(tf.isNull, lit(0L)).otherwise(
            qfix(lit(q.qb) * (tf * (k1 + 1)) /
              (tf + lit(k1) * (lit(1 - b) + lit(b / avgdl) * col("doc_len")))))
        }.reduce(_ + _)
        matched
          .join(index.docStats.select("doc_id", "conv_id", "doc_len").hint("merge"), "doc_id")
          .withColumn("score", sat.cast("double") / ScoreScale)
      case Bm25 =>
        // long-query fallback: per-doc contribution list folded on the
        // fixed-point grid — order-independent by construction (see
        // ScoreScale), so no sort is needed before the fold
        val contribAgg =
          collect_list(struct(col("term_id"), col("qb"), col("tf"))).as("contribs")
        val grouped = decoded
          .withColumn("qb", element_at(qbMap, col("term_id")))
          .groupBy("doc_id")
        val matched = mode match {
          case Or  => grouped.agg(contribAgg)
          case And => grouped
            .agg(count(lit(1)).as("nterms"), contribAgg)
            .filter(col("nterms") === qts.length)
        }
        matched
          .join(index.docStats.select("doc_id", "conv_id", "doc_len").hint("merge"), "doc_id")
          .withColumn("score",
            aggregate(col("contribs"), lit(0L), (acc, c) =>
              acc + qfix(c.getField("qb") * (c.getField("tf") * (k1 + 1)) /
                (c.getField("tf") + lit(k1) * (lit(1 - b) + lit(b / avgdl) * col("doc_len")))))
              .cast("double") / ScoreScale)
    }

    scored0
      // T2: engine standardizes on the client-side threshold (score > 0)
      .filter(col("score") > 0.0)
      // T1: deterministic tie-break by doc_id (reference tie order is
      // HashMap-unstable; SURVEY.md §7.4 risk 3)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k) // TakeOrderedAndProject: per-partition heap + merge
      .select("doc_id", "conv_id", "score")
  }

  /**
   * Batch serving: score MANY queries in ONE Spark job — the offline
   * evaluation / reranking shape (score a query log, build a training set,
   * run a relevance sweep). Single-query serving pays ~0.2 s of fixed
   * planning+scheduling per query; the batch path pays it once: the union
   * of all queries' terms drives ONE pushed-`IN` decode, a small broadcast
   * (query_id, term_id, weight) table fans each posting out to the queries
   * that want it, one (query_id, doc_id) aggregation scores everything,
   * and a per-query window takes each top-k. Per-query results are
   * IDENTICAL to `search` (RankIdentitySpec asserts equality).
   *
   * Output: (query_id, doc_id, conv_id, score, rank), rank 1..k per query,
   * ordered within a query by (score desc, doc_id asc). Queries that are
   * empty after analysis/OOV-drop (or with qNorm 0 under cosine) simply
   * produce no rows, exactly as `search` returns an empty frame.
   */
  /** Batch pruning cutover: 4× the single-query one. The batch θ job costs
    * ~0.3 s regardless of batch size, and the batch's exact path amortizes
    * decode across queries, so pruning breaks even later — measured at the
    * 400k-conv bench (5.9M candidate (query, term) postings): unpruned
    * 1.34 s vs pruned 1.63 s with 0% blocks cut (homogeneous corpus =
    * flat score distributions = powerless bounds). The pruned path is the
    * 10^9-posting regime's tool, exactly like the single-query cutover. */
  /** Below this many total candidate postings the WAND θ phase costs more
    * than the decode it prunes, so the query serves through the exact
    * single-job path (identical results either way — θ = 0 is sound).
    * Break-even arithmetic: the θ job is ~0.2 s of fixed scheduling/
    * broadcast cost; decode+score runs ~5–10M postings/s on this box, and
    * pruning saves at most the decoded fraction — so below a few million
    * candidate postings pruning cannot pay for its own job. Measured: at
    * 600k postings/query the pruned path is ~1.4× SLOWER than exact; block
    * skipping is the 10^9+-postings regime's tool (where it is the only
    * viable path), not a small-index win.
    * (Declared BEFORE BatchExactCutover: a same-class forward val reference
    * silently initializes to 0 — which made the r4 batch cutover 0, running
    * the batch θ job on EVERY batch, part of the j1_batch_topk regression.) */
  val WandExactCutover: Long = 1L << 22

  val BatchExactCutover: Long = 4L * WandExactCutover

  /** Below this many candidate (query, term) posting fan-out rows the batch
    * path skips the full-parallelism respread of the shared decode (VERDICT
    * r4 #5): the exchange bought the 13-query 3.9× win (5.9M fan-out rows
    * were serializing into the serving cache's ~15 partitions) but costs
    * more than it saves on a small batch. ≈2M rows ≈ the work of one
    * serving-sized partition (IndexView.servingPartitions), i.e. respread
    * once the batch carries more than a couple of tasks' worth of scoring. */
  val BatchRespreadCutover: Long = 1L << 21

  def searchBatch(
      spark: SparkSession,
      queries: Seq[(String, String)],
      k: Int,
      scorer: Scorer = Bm25,
      exactCutover: Long = -1L): DataFrame = {
    val cutover = if (exactCutover >= 0L) exactCutover else BatchExactCutover
    import spark.implicits._
    require(scorer != TfIdfCosine || cfg.cosineNorms,
      "index was built with cosineNorms=false (BM25-only maintenance mode); " +
        "tf-idf cosine scoring needs a norms rebuild")
    // duplicate ids would silently merge two queries' contributions into
    // one aggregation group — refuse loudly instead
    require(queries.map(_._1).distinct.length == queries.length,
      s"searchBatch: duplicate query_id in ${queries.map(_._1).mkString(",")}")
    val qts: Seq[(String, Seq[QueryTerm])] =
      queries.map { case (qid, text) => qid -> queryTerms(spark, text) }
    val live = qts.filter { case (_, ts) =>
      ts.nonEmpty &&
        (scorer != TfIdfCosine || math.sqrt(ts.map(t => t.qw * t.qw).sum) > 0.0)
    }
    val empty = spark.emptyDataset[(String, Long, String, Double, Int)]
      .toDF("query_id", "doc_id", "conv_id", "score", "rank")
    if (live.isEmpty) return empty

    // queries ride through the big aggregation as a dense INT index, not
    // the caller's string id: the (query, doc) hash-agg touches millions of
    // rows, and narrow numeric keys measurably beat string keys there; the
    // string id is restored on the k·|queries| result rows at the end
    val qids: Seq[String] = live.map(_._1)
    val qidLit = typedLit(qids.zipWithIndex.map { case (q, i) => i -> q }.toMap)
    // (qidx, term_id, w): w = qwIdf for cosine, qtf·idf25 for BM25
    val qTermRows = live.zipWithIndex.flatMap { case ((_, ts), qi) =>
      ts.map(t => (qi, t.termId, if (scorer == TfIdfCosine) t.qwIdf else t.qb))
    }
    val qTerms = broadcast(qTermRows.toDF("qidx", "term_id", "w"))
    val termIds = live.flatMap(_._2.map(_.termId)).distinct

    // BM25 batches above the cutover get per-query block-max pruning on the
    // SHARED decode (batchSurvivorBlocks) — exact results, far fewer blocks
    val decoded = (if (scorer == Bm25)
      batchSurvivorBlocks(spark, live, k, cutover) else None)
      .map(decodeBlocks)
      .getOrElse(decodedPostings(spark, termIds))
    val k1 = cfg.k1
    val b = cfg.b
    val avgdl = if (index.meta.avgdl > 0) index.meta.avgdl else 1.0

    val scored = scorer match {
      case TfIdfCosine =>
        val qNorms = typedLit(live.zipWithIndex.map { case ((_, ts), qi) =>
          qi -> math.sqrt(ts.map(t => t.qw * t.qw).sum)
        }.toMap)
        decoded.join(qTerms, "term_id")
          .groupBy("qidx", "doc_id")
          .agg(sum(col("w") * col("tf")).as("cnum"))
          .join(index.docStats.select("doc_id", "max_tf", "norm"), "doc_id")
          .withColumn("score",
            when(col("max_tf") === 0 || col("norm") === 0.0, 0.0)
              .otherwise(col("cnum") / col("max_tf") /
                (element_at(qNorms, col("qidx")) * col("norm"))))
      case Bm25 =>
        // doc_len joins the DECODED postings once (guarded broadcast —
        // 1 probe per posting, not per (query, posting) pair), the
        // per-posting BM25 term is a codegen expression, and the
        // per-(query, doc) accumulation is a plain hash-aggregate `sum` of
        // fixed-point longs — order-independent, so it is bit-equal to the
        // single-query path's fixed-order fold (see ScoreScale). This
        // replaces the r3 collect_list/ObjectHashAggregate + post-agg stats
        // join shape, which paid a per-group list materialization and a
        // second join (r3 verdict #5: batch amortization was ~12%). Agg rows
        // carry only (int, long, long) — conv_ids resolve on the
        // k·|queries| result.
        val dl = index.docStats.select("doc_id", "doc_len")
        val dlDim =
          if (index.meta.docs <= IndexBuilder.BroadcastRowLimit) broadcast(dl) else dl
        // the serving layout deliberately keeps FEW partitions (single-query
        // fixed cost ~ tasks/stage), but a LARGE batch's fan-out work is
        // throughput-bound — respread the decoded postings across the full
        // parallelism so the joins + per-posting scoring don't serialize
        // into the cache's handful of partitions (measured: 13-query batch
        // 4.4 s → ~1.5 s on 32 cores). ADAPTIVE (VERDICT r4 #5): the extra
        // exchange is pure overhead on a small batch (j1_batch_topk
        // 0.91 → 2.06 s in BENCH_r04), so it runs only when the batch's
        // candidate (query, term) posting fan-out — the row count the
        // scoring join actually produces — clears BatchRespreadCutover.
        val batchParts = math.max(
          2 * spark.sparkContext.defaultParallelism,
          math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt))
        val fanout = live.flatMap(_._2).map(_.df).sum
        val spread =
          if (fanout >= BatchRespreadCutover)
            decoded.repartition(batchParts, col("doc_id"))
          else decoded
        spread
          .join(dlDim, "doc_id")
          .join(qTerms, "term_id")
          .withColumn("c",
            qfix(col("w") * (col("tf") * (k1 + 1)) /
              (col("tf") + lit(k1) * (lit(1 - b) + lit(b / avgdl) * col("doc_len")))))
          .groupBy("qidx", "doc_id")
          .agg(sum(col("c")).as("sfix"))
          .withColumn("score", col("sfix").cast("double") / ScoreScale)
    }

    // bounded per-query top-k heap aggregate instead of a row_number window:
    // partial aggregation keeps ≤ k rows per (query, task) before the
    // exchange and nothing sorts a full match list (TopKAggregator); the
    // conv_id join touches only the ≤ k·|queries| winners afterwards
    val topk = udaf(new TopKAggregator(k), TopKAggregator.inputEncoder)
    val winners = scored
      .filter(col("score") > 0.0)
      .groupBy("qidx")
      .agg(topk(col("doc_id"), lit(""), col("score")).as("hits"))
      .select(col("qidx"), posexplode(col("hits")).as(Seq("pos", "h")))
      .select(
        element_at(qidLit, col("qidx")).as("query_id"),
        col("h.doc_id").as("doc_id"),
        col("h.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
    // winners are ≤ k·|queries| rows — broadcast THEM into the stats probe,
    // so conv_id resolution never moves the stats table
    broadcast(winners)
      .join(index.docStats.select("doc_id", "conv_id"), "doc_id")
      .select("query_id", "doc_id", "conv_id", "score", "rank")
  }

  /**
   * Per-query block-max pruning for the BATCH path (r3 verdict #5): the
   * shared decode is the batch's dominant cost once per-query fixed costs
   * amortize, and without pruning it sweeps every block of every query's
   * terms. This is the two-phase WAND of `searchBm25Wand` generalized to N
   * queries with ONE extra job:
   *
   *  1. θ_q per query = the k-th largest EXACT FULL q-score among the docs
   *     living in t*_q's top-k blocks (same candidate-doc θ as the
   *     single-query `wandPlan` — a t*-only θ can never clear the other
   *     terms' global-max slack in the prune condition, so multi-term
   *     batches pruned 0% with it). Computed in two tiny jobs detailed at
   *     the implementation below; a −1e-9 margin absorbs the fixed-point
   *     accumulation grid's ≤1e-15 quantization, so θ stays a sound lower
   *     bound on q's k-th best total.
   *  2. A block b of term t survives iff SOME query wants it:
   *     ∃ q∋t: qtf·bound_t(b) + Σ_{t'≠t} qtf·gmax(t') ≥ θ_q
   *     ⇔ bound_t(b) ≥ min_{q∋t} (θ_q − sumGmax_q + qtf·gmax_t)/qtf —
   *     ONE per-term threshold, applied as a codegen filter on block
   *     metadata before any decode.
   *
   * Soundness per query: a doc in a block dropped for ALL queries scores
   * < θ_q for each q containing its term, so it cannot reach any top-k;
   * every true top-k doc keeps all its blocks (its bounds dominate its
   * true score ≥ θ). Results are therefore IDENTICAL to the unpruned
   * batch (WandFuzzSpec forces the pruned path and asserts equality).
   * None = below the cutover / no driver bounds / nothing prunable —
   * caller decodes the full term set.
   */
  private[graft] def batchSurvivorBlocks(
      spark: SparkSession,
      live: Seq[(String, Seq[QueryTerm])],
      k: Int,
      exactCutover: Long): Option[Dataset[Block]] = {
    if (live.flatMap(_._2).map(_.df).sum <= exactCutover) return None
    val tb = index.wandTermBounds.getOrElse(return None)
    val bk1 = cfg.k1
    val bb = cfg.b
    val bAvgdl = if (index.meta.avgdl > 0) index.meta.avgdl else 1.0
    def sat(tf: Double, dl: Double): Double =
      (tf * (bk1 + 1)) / (tf + bk1 * (1 - bb + bb * dl / bAvgdl))
    val allTerms: Map[Long, QueryTerm] = live.flatMap(_._2).map(t => t.termId -> t).toMap
    val gmax: Map[Long, Double] = allTerms.map { case (tid, t) =>
      tid -> (tb.get(tid) match {
        case Some((mt, md)) => t.bm25Idf * sat(mt.toDouble, md.toDouble)
        case None => 0.0
      })
    }
    case class QInfo(qid: String, ts: Seq[QueryTerm], tStar: QueryTerm, sumGmax: Double)
    val infos = live.map { case (qid, ts) =>
      QInfo(qid, ts,
        ts.maxBy(t => (t.qtf * gmax.getOrElse(t.termId, 0.0), t.termId)),
        ts.map(t => t.qtf * gmax.getOrElse(t.termId, 0.0)).sum)
    }
    val starIds = infos.map(_.tStar.termId).distinct

    val idfLit = typedLit(allTerms.map { case (tid, t) => tid -> t.bm25Idf })
    val blockBound = element_at(idfLit, col("term_id")) *
      (col("max_tf") * (bk1 + 1)) /
      (col("max_tf") + lit(bk1) * (lit(1 - bb) + lit(bb / bAvgdl) * col("min_dl")))

    // θ_q = k-th largest EXACT FULL q-score among the docs in the t* terms'
    // top-k blocks — the same candidate-doc θ as the single-query wandPlan
    // (a t*-only θ can never clear the other terms' global-max slack in the
    // prune condition, so multi-term batches pruned 0%). At most two tiny
    // jobs: (1) metadata-only top-k block intervals per t* term, served
    // from the view's (term, k) interval cache — zero jobs once the terms
    // are warm (VERDICT r5 #4); (2) decode every query term's blocks
    // overlapping the merged intervals, score per (query, doc) via the
    // broadcast (qid, term, weight) table, collect the k-th value per
    // query. Partial scores at interval edges only LOWER θ, so soundness
    // per query is unchanged.
    import spark.implicits._
    val intervals: Array[(Long, Long)] =
      topBlockIntervals(starIds, k).values.flatten.toArray.sorted
    if (intervals.isEmpty) return None
    val merged = intervals.foldLeft(List.empty[(Long, Long)]) {
      case ((s, e) :: acc, (f, l)) if f <= e => (s, math.max(e, l)) :: acc
      case (acc, iv) => iv :: acc
    }.reverse.toArray
    val starts = merged.map(_._1)
    val ends = merged.map(_._2)
    val overlaps = udf((first: Long, last: Long) => {
      var lo = 0
      var hi = starts.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (starts(m) <= last) lo = m + 1 else hi = m
      }
      lo > 0 && ends(lo - 1) >= first
    })
    val qw = broadcast(infos.flatMap(i =>
      i.ts.map(t => (i.qid, t.termId, t.qtf * t.bm25Idf)))
      .toDF("qid", "term_id", "w"))
    val candBlocks = index.postings
      .filter(col("term_id").isin(allTerms.keys.toSeq: _*))
      .filter(overlaps(col("first_doc_id"), col("last_doc_id")))
      .as[Block]
    val kth: Map[String, Double] = index.docStats
      .select(col("doc_id"), col("doc_len"))
      .join(broadcast(decodeBlocks(candBlocks)), "doc_id")
      .withColumn("cu", (col("tf") * (bk1 + 1)) /
        (col("tf") + lit(bk1) * (lit(1 - bb) + lit(bb / bAvgdl) * col("doc_len"))))
      .join(qw, "term_id")
      .groupBy(col("qid"), col("doc_id")).agg(sum(col("w") * col("cu")).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("s").desc)))
      .filter(col("rn") === k)
      .select("qid", "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val thetas: Map[String, Double] = infos.map { i =>
      i.qid -> (if (i.tStar.df < k) 0.0
        else kth.get(i.qid).map(s => math.max(0.0, s - 1e-9)).getOrElse(0.0))
    }.toMap
    if (thetas.values.forall(_ <= 0.0)) return None

    val need: Map[Long, Double] = allTerms.keysIterator.map { tid =>
      val qs = infos.filter(_.ts.exists(_.termId == tid))
      tid -> qs.map { i =>
        val th = thetas(i.qid)
        if (th <= 0.0) Double.NegativeInfinity
        else {
          val qt = i.ts.find(_.termId == tid).get
          (th - i.sumGmax + qt.qtf * gmax.getOrElse(tid, 0.0)) / qt.qtf
        }
      }.min
    }.toMap
    val needLit = typedLit(need)
    Some(index.postings
      .filter(col("term_id").isin(allTerms.keys.toSeq: _*))
      .filter(blockBound >= element_at(needLit, col("term_id"))))
  }

  /**
   * Block-max pruned BM25 top-k (the north rule's WAND path).
   *
   * Sound two-phase distributed variant:
   *  1. θ = k-th largest exact single-term contribution of the highest-impact
   *     query term t* (each doc's total ≥ its t* contribution, so θ lower-
   *     bounds the k-th best total score).
   *  2. Drop every block b of term t with
   *     qtf_t·blockbound_t(b) + Σ_{t'≠t} qtf_{t'}·globalmax(t') < θ:
   *     any doc in such a block has true score < θ, hence cannot be top-k,
   *     and every true top-k doc keeps all its blocks (its block bounds
   *     dominate its true score ≥ θ). Property-tested equal to the exact
   *     path in WandSpec.
   *
   * Block bounds are assembled HERE, from append-invariant block metadata
   * (max_tf, min_dl — Schemas.Block) and the CURRENT dictionary/meta stats:
   *   blockbound_t(b) = idf25(t) · s(max_tf(b), min_dl(b), avgdl)
   * with s(tf,dl,·) the BM25 tf-saturation term. Sound because s is
   * increasing in tf and decreasing in dl, so every posting in the block
   * scores ≤ the bound; appended batches change idf25/avgdl without
   * invalidating stored blocks.
   */
  def searchBm25Wand(
      spark: SparkSession,
      query: String,
      k: Int,
      exactCutover: Long = WandExactCutover): DataFrame = {
    import spark.implicits._
    val qts = queryTerms(spark, query)
    if (qts.isEmpty) return spark.emptyDataset[Hit].toDF()
    if (qts.map(_.df).sum <= exactCutover)
      return scoreTerms(spark, qts, k, Or, Bm25, None)
    val (_, survivors) = wandPlan(spark, qts, k)
    // decode via the native generator (same helper as the exact path) —
    // postings stay in Tungsten; the survivors path is exactly the 10^9+-
    // postings regime where a per-block object round-trip costs most
    scoreTerms(spark, qts, k, Or, Bm25, Some(decodeBlocks(survivors)))
  }

  /** The WAND pruning decision for an analyzed term set: (candidate block
    * set, surviving block set). Shared by [[searchBm25Wand]] and the
    * pruning diagnostics (graft.WandSkew / Bench's wand_prune section),
    * so what the probe counts IS what serving decodes. */
  private[graft] def wandPlan(
      spark: SparkSession, qts: Seq[QueryTerm], k: Int): (Dataset[Block], Dataset[Block]) = {
    import spark.implicits._
    val termIds = qts.map(_.termId)

    val bk1 = cfg.k1; val bb = cfg.b
    val bAvgdl = if (index.meta.avgdl > 0) index.meta.avgdl else 1.0
    def sat(tf: Double, dl: Double): Double =
      (tf * (bk1 + 1)) / (tf + bk1 * (1 - bb + bb * dl / bAvgdl))
    val bIdfLit = typedLit(qts.map(q => q.termId -> q.bm25Idf).toMap)
    // per-block sound upper bound on the BM25 per-posting term score; the
    // query-side multiplier for doc contributions is then qtf alone
    val blockBound = element_at(bIdfLit, col("term_id")) *
      (col("max_tf") * (bk1 + 1)) /
      (col("max_tf") + lit(bk1) * (lit(1 - bb) + lit(bb / bAvgdl) * col("min_dl")))

    // per-term global max BM25 doc weight: ZERO jobs from the view's
    // driver-resident term-level block bounds (sound: s is increasing in tf,
    // decreasing in dl, so pairing the term-wide max_tf with the term-wide
    // min_dl only raises the bound); per-query metadata agg above the guard
    val gmax: Map[Long, Double] = index.wandTermBounds match {
      case Some(tb) =>
        qts.map(q => q.termId -> (tb.get(q.termId) match {
          case Some((mt, md)) => q.bm25Idf * sat(mt.toDouble, md.toDouble)
          case None => 0.0
        })).toMap
      case None => index.postings
        .filter(col("term_id").isin(termIds: _*))
        .withColumn("bound", blockBound)
        .groupBy("term_id").agg(max("bound").as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }

    val tStar = qts.maxBy(q => q.qtf * gmax.getOrElse(q.termId, 0.0))
    // θ = k-th largest EXACT FULL score among the docs living in t*'s k most
    // promising blocks. The r1–r4 θ used t*-ONLY contributions — sound, but
    // structurally powerless on multi-term queries: the prune condition
    // compares θ against bound_t(b) + Σ_{t'≠t} gmax(t'), and a θ capped at
    // one term's contribution can never exceed the other terms' global
    // maxima, so nothing pruned unless one term dominated (measured 0% even
    // on the score-skewed fixture). Scoring the candidate docs FULLY costs
    // one more tiny decode — other terms' blocks overlapping t*'s top-block
    // docId intervals (any doc inside the intervals has ALL its postings in
    // overlapping blocks, so its computed score is complete; docs straddling
    // the edges score partially, which only lowers θ) — and the resulting
    // θ is a set of real documents' true scores, so its k-th largest lower-
    // bounds the true k-th best total: pruning stays exact (WandFuzzSpec)
    // and now bites whenever score mass is block-clustered (WandSkew).
    val theta: Double = {
      // fewer than k docs carry t* → the candidate set may be < k docs →
      // θ would not be a sound k-th-total lower bound → disable pruning
      if (tStar.df < k) 0.0
      else {
        // the k most promising t* blocks' intervals — from the view's
        // (term, k) cache; one metadata job on a cold term, zero warm
        // (VERDICT r5 #4)
        val intervals = topBlockIntervals(Seq(tStar.termId), k)(tStar.termId)
        if (intervals.isEmpty) 0.0
        else {
          val starts = intervals.map(_._1)
          val ends = intervals.map(_._2)
          val overlaps = udf((first: Long, last: Long) => {
            var lo = 0
            var hi = starts.length
            while (lo < hi) {
              val m = (lo + hi) >>> 1
              if (starts(m) <= last) lo = m + 1 else hi = m
            }
            lo > 0 && ends(lo - 1) >= first
          })
          // job 2: decode every query term's overlapping blocks (≤ |q|·k
          // blocks), broadcast the tiny decoded side into the stats probe,
          // and take the k-th largest exact per-doc total
          val qbLit = typedLit(qts.map(q => q.termId -> q.qb).toMap)
          val cand = index.postings
            .filter(col("term_id").isin(termIds: _*))
            .filter(overlaps(col("first_doc_id"), col("last_doc_id")))
            .as[Block]
          val cs = index.docStats.select(col("doc_id"), col("doc_len"))
            .join(broadcast(decodeBlocks(cand)), "doc_id")
            .withColumn("c", element_at(qbLit, col("term_id")) * (col("tf") * (bk1 + 1)) /
              (col("tf") + lit(bk1) * (lit(1 - bb) + lit(bb / bAvgdl) * col("doc_len"))))
            .groupBy(col("doc_id")).agg(sum(col("c")).as("s"))
            .orderBy(col("s").desc)
            .limit(k)
            .select("s")
            .collect()
          // the same 1e-9 margin the batch path subtracts: scores accumulate
          // on the 1e-15 fixed-point grid (ScoreScale), so a doc's quantized
          // total can land an ulp below its exact sum — the margin keeps θ a
          // sound lower bound under quantization (ADVICE r4)
          if (cs.length < k) 0.0 else math.max(0.0, cs.last.getDouble(0) - 1e-9)
        }
      }
    }

    val sumGmax = qts.map(q => q.qtf * gmax.getOrElse(q.termId, 0.0)).sum
    val gmaxLit = typedLit(qts.map(q =>
      q.termId -> (sumGmax - q.qtf * gmax.getOrElse(q.termId, 0.0))).toMap)
    val qtfLit = typedLit(qts.map(q => q.termId -> q.qtf.toDouble).toMap)

    val candidates = index.postings.filter(col("term_id").isin(termIds: _*))
    val survivors = candidates
      .filter(element_at(qtfLit, col("term_id")) * blockBound +
        element_at(gmaxLit, col("term_id")) >= theta)
    (candidates, survivors)
  }
}
