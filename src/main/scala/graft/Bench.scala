package graft

import org.apache.spark.sql.SparkSession

import graft.ir._

/**
 * Benchmark main (driver contract): prints ONE JSON line with the round's
 * numbers against BASELINE.md, and — new in r6 (VERDICT r5 #1) — writes the
 * partially-merged JSON to `bench_out.json` after EVERY completed section,
 * so a wall-clock timeout costs only the tail sections instead of the whole
 * artifact. A global deadline (`SPARK_GRAFT_BENCH_DEADLINE`, seconds,
 * default 2700 = 45 min against the driver's 60-minute budget) gates every
 * OPTIONAL spend (scaling re-measures, the informational 2→8 pair, extra
 * append rounds); whatever is skipped is recorded in the JSON.
 *
 * Sections, in the order they run (most-drift-sensitive first — the
 * scaling pairs measure a RATIO, so they get the freshest host window):
 *
 *  - `build`    in-JVM 1→4 thread scaling on identical input, INTERLEAVED
 *               (N,4N,N,4N — VERDICT r5 #2: drift spanning one level's
 *               whole sequential window biased the ratio; alternating
 *               sessions puts both levels inside every drift window) with
 *               per-level minima.
 *  - `cluster`  local-cluster 2×2 → 8×2 executor JVMs (separate heaps/GC,
 *               the sandbox's closest stand-in for N→4N executors), same
 *               interleaving, double-size corpus.
 *  - `build_2_8` informational in-JVM 2→8 (kept comparable with r1–r5);
 *               optional under the deadline.
 *  - serving    one full-box session: 13-query latency percentiles,
 *               `serving_ratio` (current searcher vs a PINNED r3-shape
 *               exact plan, back-to-back so host drift cancels — VERDICT
 *               r5 #4), batch serving, and `wand_prune` on the score-skewed
 *               corpus (quarter-size, session reused — VERDICT r5 #1c; the
 *               skewed BUILD runs with AQE on, only the timed queries run
 *               AQE-off — ADVICE r5).
 *  - `append`   append-vs-rebuild in both maintenance modes, best-of-N.
 *  - `streaming` end-to-end ingest (MemoryStream waves → slim sessionizer →
 *               async staged flushes), arrival window sized so flushes
 *               overlap arrivals (VERDICT r5 #5).
 *  - `queries`  the SparkEntry operator sweep at the given sfDir.
 */
object Bench {

  // ------------------------------------------------------------ sections
  private val frags = scala.collection.mutable.ArrayBuffer.empty[String]
  private val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
  private var benchT0 = System.nanoTime()
  private var deadlineSec = 2700.0
  private def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
  private def timeLeft: Double = deadlineSec - elapsedSec

  private def jsonEscape(s: String): String = s.take(160).flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def mergedJson(partial: Boolean): String = {
    val sk = skipped.map(s => s""""${jsonEscape(s)}"""").mkString("[", ",", "]")
    s"""{"metric":"total","value":${f"$elapsedSec%.3f"},"unit":"sec",""" +
      s""""partial":$partial,"deadline_sec":${deadlineSec.toInt},"skipped":$sk""" +
      (if (frags.isEmpty) "" else frags.mkString(",", ",", "")) + "}"
  }

  /** Record a completed section and rewrite bench_out.json with everything
    * so far — the incremental artifact VERDICT r5 #1 asks for. */
  private def emit(fragment: String): Unit = {
    frags += fragment
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), mergedJson(partial = true) + "\n")
    ()
  }

  // ------------------------------------------------------------ sessions
  private def newSession(master: String, shufflePartitions: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-bench")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      // executor JVMs need the app classes and the JDK17 module opens the
      // driver got from build.sbt; java.class.path carries the exact forked
      // classpath (absolute paths)
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", JvmOpens.forExecutors)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The 13 reference bot queries (InitClient.java:124-138). */
  private val botQueries = Seq(
    "primera consulta",
    "universidad riqueza atletismo argentina estado nacion edificio comunicacion",
    "tecnologia", "pais", "estado libre", "pais libre",
    "perro libre finanzas religion estado morfologia",
    "tecnologia libre", "ultima consulta", "pais libre", "estado libre",
    "tecnologia", "pais")

  private def copyDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val s = Paths.get(src)
    val d = Paths.get(dst)
    val walk = Files.walk(s)
    try walk.forEach { (p: Path) =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    } finally walk.close()
  }

  // a small untimed build first in each session warms JIT + shuffle
  // machinery so no parallelism level pays one-time JVM costs
  private def warmup(spark: SparkSession, convs: Int): Unit = {
    val w = Synth.turns(spark, math.max(1000, convs / 40), seed = 7L).cache()
    w.count()
    IndexBuilder.build(spark, w, BuildConfig()).meta
    w.unpersist()
    spark.catalog.clearCache()
  }

  /** ONE warmed session, ONE timed build — the interleaving unit. */
  private def measureOnce(master: String, shuffleParts: Int, convs: Int): (Long, Double) = {
    val spark = newSession(master, shuffleParts)
    try {
      warmup(spark, convs)
      val turns = Synth.turns(spark, convs).cache()
      val n = turns.count() // materialize input outside the timed span
      (n, time(IndexBuilder.build(spark, turns, BuildConfig()))._2)
    } finally { spark.stop(); System.gc() }
  }

  /**
   * Interleaved scaling pair (VERDICT r5 #2): levels alternate
   * (N,4N,N,4N,…) so host drift spanning minutes hits BOTH levels of every
   * round instead of biasing the ratio, and per-level minima across rounds
   * keep best-of-N's least-interference estimator. Two base rounds always
   * run; when the resulting efficiency lands outside the plausible `band`
   * (the same symmetric trigger as r3–r5 — an implausibly HIGH ratio
   * re-measures exactly like a low one), up to two extra rounds run ONLY if
   * the global deadline leaves `reserve` seconds for the sections after
   * this one (VERDICT r5 #1b) — a skipped re-measure is recorded, not
   * silent.
   */
  private def interleavedPair(
      label: String,
      mN: String, pN: Int, m4: String, p4: Int,
      convs: Int, band: (Double, Double),
      reserve: Double): ((Long, Double), (Long, Double), Int) = {
    var nTurns = 0L
    var bestN = Double.MaxValue
    var best4 = Double.MaxValue
    var rounds = 0
    var roundCost = 0.0
    def oneRound(): Unit = {
      val t0 = System.nanoTime()
      val (n1, s1) = measureOnce(mN, pN, convs)
      val (_, s4) = measureOnce(m4, p4, convs)
      nTurns = n1
      bestN = math.min(bestN, s1)
      best4 = math.min(best4, s4)
      rounds += 1
      roundCost = (System.nanoTime() - t0) / 1e9
    }
    oneRound(); oneRound()
    def eff = (bestN / best4) / 4.0
    var extra = 0
    while (extra < 2 && (eff < band._1 || eff > band._2)) {
      if (timeLeft < reserve + roundCost * 1.05) {
        skipped += s"$label:remeasure (eff ${f"$eff%.3f"} outside band, deadline)"
        extra = 2
      } else { oneRound(); extra += 1 }
    }
    ((nTurns, bestN), (nTurns, best4), rounds)
  }

  def main(args: Array[String]): Unit = {
    benchT0 = System.nanoTime()
    deadlineSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE", "2700").toDouble
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // large enough that tasks are chunky and the parallel fraction dominates
    // fixed job-scheduling costs (the 10^12-turn regime in miniature)
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val nCores = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "1").toInt

    // ---- in-JVM thread-scaling pair 1→4, identical input, INTERLEAVED ----
    // Headline pair 1→4: in a single JVM all "executors" share one memory
    // bus and one GC, so thread-scaling efficiency decays with the TOTAL
    // thread count regardless of code (measured ladder, round 2: 1→4 =
    // 0.81, 2→8 = 0.59–0.72, 8→32 ≈ 0.3; pure-CPU no-JVM control 8→32 =
    // 0.79 — BENCH/BASELINE.md). Runs FIRST: the ratio is the artifact most
    // corrupted by host drift, so it gets the freshest window (VERDICT r5 #2).
    val ((nTurns1, sec1), (_, sec4), rounds14) =
      interleavedPair("build", s"local[$nCores]", 2 * nCores,
        s"local[${4 * nCores}]", 8 * nCores, nConvs, (0.82, 1.05),
        reserve = 20 * 60.0)
    val eff14 = (sec1 / sec4) / 4.0
    emit(
      s""""build":{"n_turns":$nTurns1,"n_cores":$nCores,"n4_cores":${4 * nCores},""" +
      s""""sec_localN":${f"$sec1%.3f"},"sec_local4N":${f"$sec4%.3f"},""" +
      s""""turns_per_sec_localN":${f"${nTurns1 / sec1}%.1f"},""" +
      s""""turns_per_sec_local4N":${f"${nTurns1 / sec4}%.1f"},""" +
      s""""interleaved_rounds":$rounds14,""" +
      s""""scaling_efficiency":${f"$eff14%.3f"}}""")

    // ---- local-cluster scaling: separate executor JVMs (VERDICT r2 #5) ----
    // 2 executors × 2 cores → 8 executors × 2 cores: per-executor heap and
    // GC scale WITH the cores, as on a real cluster; only the memory bus
    // stays shared. DOUBLE-size corpus (r4): at 16 cluster cores the
    // half-size build's ~5 s of per-stage scheduling/RPC fixed cost was
    // measuring the scheduler, not the engine (ladder in BENCH/BASELINE.md).
    val clusterConvs = 2 * nConvs
    try {
      // separate-JVM pair: its historical band sits lower (per-executor
      // JVM startup is a bigger fixed fraction), so the guard's floor is
      // the verdict's ≥0.7 cluster target rather than the in-JVM 0.82
      val ((ct, cSec2), (_, cSec8), cRounds) =
        interleavedPair("cluster", "local-cluster[2,2,6144]", 8,
          "local-cluster[8,2,6144]", 32, clusterConvs, (0.70, 1.05),
          reserve = 14 * 60.0)
      val cEff = (cSec2 / cSec8) / 4.0
      emit(
        s""""cluster":{"mode":"local-cluster","execs_n":2,"execs_4n":8,""" +
        s""""cores_per_exec":2,"n_turns":$ct,"sec_n":${f"$cSec2%.3f"},""" +
        s""""sec_4n":${f"$cSec8%.3f"},"turns_per_sec_n":${f"${ct / cSec2}%.1f"},""" +
        s""""turns_per_sec_4n":${f"${ct / cSec8}%.1f"},""" +
        s""""interleaved_rounds":$cRounds,""" +
        s""""scaling_efficiency":${f"$cEff%.3f"}}""")
    } catch {
      case e: Throwable =>
        emit(s""""cluster":{"skipped":"${jsonEscape(
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")}"}""")
    }

    // ---- informational in-JVM 2→8 (comparable with r1–r5) — optional ----
    if (timeLeft > 16 * 60.0) {
      val (_, sec2) = measureOnce(s"local[${2 * nCores}]", 4 * nCores, nConvs)
      val (_, sec8) = measureOnce(s"local[${8 * nCores}]", 16 * nCores, nConvs)
      val eff28 = (sec2 / sec8) / 4.0
      emit(
        s""""build_2_8":{"n_cores":${2 * nCores},"n4_cores":${8 * nCores},""" +
        s""""sec_localN":${f"$sec2%.3f"},"sec_local4N":${f"$sec8%.3f"},""" +
        s""""best_of":1,"scaling_efficiency":${f"$eff28%.3f"}}""")
    } else {
      skipped += "build_2_8 (informational pair, deadline)"
      emit(s""""build_2_8":{"skipped":"deadline"}""")
    }

    // ---- serving measurements on a full-box session ----
    val servingCores = sys.env.getOrElse("SPARK_GRAFT_BENCH_SERVE",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = newSession(s"local[$servingCores]", 2 * servingCores)
    val view = {
      val turns = Synth.turns(spark, nConvs).cache()
      turns.count()
      // serving layout (S12): term_id-clustered postings cache +
      // doc_id-co-partitioned stats + driver-resident vocabulary, all
      // built once before the timed window, like a server at startup;
      // partition count sized for query tasks, not build tasks
      val built = IndexBuilder.build(spark, turns, BuildConfig())
      spark.conf.set("spark.sql.shuffle.partitions",
        IndexView.servingPartitions(built.meta, spark).toString)
      // serving plans are small and fixed-shape: AQE's per-exchange stage
      // materialization is pure per-query scheduling overhead here
      // (measured: 13-query batch 1.59 -> 1.25 s, single-query a wash —
      // LatencyProbe A/B, BENCH/BASELINE.md r5); builds/scaling pairs above
      // keep AQE on (skew handling is load-bearing at build shuffles)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val v = built.pin()
      val _ = (v.meta, v.termLookup, v.wandTermBounds) // force lazy serving state
      v
    }

    // ---- query latency + code-relative serving ratio (VERDICT r5 #4) ----
    // pooled percentiles (primary, comparable with r1/r2) PLUS per-query
    // best-of-rounds percentiles: the pooled p95 on this host measures
    // steal as much as the engine, so the min-per-query view records the
    // engine's repeatable latency the way best-of-N records build time.
    // Each round also times a PINNED-SHAPE reference plan (the r3 exact
    // BM25 serving plan, frozen below) back-to-back with the current
    // searcher on the same query — the ratio is host-drift-free, which the
    // absolute p50 target demonstrably is not (documented 60% host swings).
    val searcher = new Searcher(view)
    def refSearch(q: String, k: Int): org.apache.spark.sql.DataFrame = {
      // pinned r3-shape comparator: decode → per-term conditional double
      // sums → stats join → plain-double BM25 fold → top-k. Kept HERE (not
      // in Search.scala) so serving changes can never drift it.
      import org.apache.spark.sql.functions._
      val qts = searcher.queryTerms(spark, q)
      if (qts.isEmpty) return spark.emptyDataFrame
      val k1 = view.cfg.k1; val b = view.cfg.b
      val avgdl = if (view.meta.avgdl > 0) view.meta.avgdl else 1.0
      val decoded = graft.functions.DecodeBlock.postings(
        view.postings.toDF().filter(col("term_id").isin(qts.map(_.termId): _*)))
      val perDoc = decoded.groupBy("doc_id")
        .agg(sum(when(col("term_id") === qts.head.termId, col("tf")))
          .as(s"tf_${qts.head.termId}"),
          qts.tail.map(t => sum(when(col("term_id") === t.termId, col("tf")))
            .as(s"tf_${t.termId}")): _*)
      val score = qts.map { t =>
        val tf = col(s"tf_${t.termId}")
        when(tf.isNull, lit(0.0)).otherwise(
          lit(t.qb) * (tf * (k1 + 1)) /
            (tf + lit(k1) * (lit(1 - b) + lit(b / avgdl) * col("doc_len"))))
      }.reduce(_ + _)
      perDoc
        .join(view.docStats.toDF().select("doc_id", "conv_id", "doc_len"), "doc_id")
        .withColumn("score", score)
        .filter(col("score") > 0.0)
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(k)
        .select("doc_id", "conv_id", "score")
    }
    searcher.search(spark, "pais libre", 10).count() // warm
    refSearch("pais libre", 10).count()
    val perQuery = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    val perQueryRef = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    (1 to 4).foreach { _ =>
      val cur = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ref = scala.collection.mutable.ArrayBuffer.empty[Double]
      botQueries.foreach { q =>
        cur += time(searcher.search(spark, q, 10, Or, Bm25).count())._2
        ref += time(refSearch(q, 10).count())._2
      }
      perQuery += cur.toSeq
      perQueryRef += ref.toSeq
    }
    val latencies = perQuery.flatten.toSeq
    def pctOf(xs: Seq[Double], p: Double) = {
      val s = xs.sorted
      s(math.min(s.length - 1, (p * s.length).toInt))
    }
    val p50 = pctOf(latencies, 0.50)
    val p95 = pctOf(latencies, 0.95)
    val best = perQuery.toSeq.transpose.map(_.min)
    val bestRef = perQueryRef.toSeq.transpose.map(_.min)
    val p50Best = pctOf(best, 0.50)
    val p95Best = pctOf(best, 0.95)
    val p50BestRef = pctOf(bestRef, 0.50)
    emit(
      s""""query_latency":{"p50_sec":${f"$p50%.4f"},"p95_sec":${f"$p95%.4f"},""" +
      s""""p50_best_sec":${f"$p50Best%.4f"},"p95_best_sec":${f"$p95Best%.4f"},""" +
      s""""n":${latencies.length}}""")
    // primary ratio = MEDIAN of the per-(query, round) pairwise ratios:
    // each cur/ref pair runs back-to-back within ~a second, so drift that
    // moves both measurements cancels inside every pair — where a ratio of
    // p50s still inherits any drift that lands between the two pooled
    // distributions (observed: a mid-probe steal spike moved the p50 ratio
    // ±0.05 while the pairwise median held)
    val pairRatios = perQuery.toSeq.zip(perQueryRef.toSeq).flatMap {
      case (cs, rs) => cs.zip(rs).map { case (c, r) => c / r }
    }
    val medianPairRatio = pctOf(pairRatios, 0.50)
    emit(
      s""""serving_ratio":{"ratio":${f"$medianPairRatio%.3f"},""" +
      s""""estimator":"median of ${pairRatios.length} back-to-back (cur, ref) pair ratios",""" +
      s""""cur_p50_best_sec":${f"$p50Best%.4f"},""" +
      s""""ref_p50_best_sec":${f"$p50BestRef%.4f"},""" +
      s""""p50_best_ratio":${f"${p50Best / p50BestRef}%.3f"},""" +
      s""""ref":"pinned r3-shape exact plan, same session, back-to-back"}""")

    // ---- batch serving: all 13 bot queries scored in ONE job ----
    // the offline-evaluation shape — per-query fixed cost amortizes across
    // the batch, so queries/sec here, not per-query latency, is the
    // 100 TB relevance-sweep metric
    val batchSec = {
      val qs = botQueries.zipWithIndex.map { case (q, i) => (s"q$i", q) }
      searcher.searchBatch(spark, qs, 10).count() // warm
      (1 to 3).map(_ => time(searcher.searchBatch(spark, qs, 10).count())._2).min
    }
    emit(
      s""""batch_serving":{"n_queries":${botQueries.length},"sec":${f"$batchSec%.3f"},""" +
      s""""queries_per_sec":${f"${botQueries.length / batchSec}%.1f"}}""")

    // ---- block-max pruning on the score-skewed corpus (VERDICT r4 #8) ----
    // the homogeneous synth corpus yields flat score distributions, where
    // sound bounds prune 0% (the honest r4 finding); this section proves the
    // pruning machinery BITES when score mass is block-clustered: candidate
    // vs surviving blocks from the serving wandPlan + a hard equality check.
    // Quarter-size corpus + session reuse (VERDICT r5 #1c — 100k convs shows
    // the same pruned fraction as 200k at half the build cost).
    {
      val skConvs = math.max(1000, nConvs / 4)
      // the skewed BUILD keeps AQE on (skew handling is load-bearing at
      // build shuffles — ADVICE r5); only the timed queries run AQE-off
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val sk = Synth.skewedTurns(spark, skConvs).cache()
      sk.count()
      val skBuilt = IndexBuilder.build(spark, sk, BuildConfig())
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val skView = skBuilt.pin()
      skView.termLookup; skView.wandTermBounds
      val s2 = new Searcher(skView)
      val q = "pais cultura produccion" // co-occurring hot triple (Synth doc)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
        df.collect().map(r => (r.getLong(0),
          math.floor(r.getDouble(2) * 1e9 + 0.5) / 1e9)).toSeq
      val same = rows(s2.search(spark, q, 10, Or, Bm25)) ==
        rows(s2.searchBm25Wand(spark, q, 10, exactCutover = 0L))
      val qts = s2.queryTerms(spark, q)
      val (cand, surv) = s2.wandPlan(spark, qts, 10)
      val nc = cand.count(); val ns = surv.count()
      val ex = (1 to 2).map(_ => time(s2.search(spark, q, 10, Or, Bm25).count())._2).min
      val wd = (1 to 2).map(_ =>
        time(s2.searchBm25Wand(spark, q, 10, exactCutover = 0L).count())._2).min
      skView.unpin(); sk.unpersist()
      emit(
        s""""wand_prune":{"convs":$skConvs,""" +
        s""""candidate_blocks":$nc,"survivor_blocks":$ns,""" +
        s""""pruned_frac":${f"${1.0 - ns.toDouble / nc}%.3f"},""" +
        s""""exact_sec":${f"$ex%.3f"},"wand_sec":${f"$wd%.3f"},"identical":$same}""")
    }

    // builds/appends below want build-sized partitioning + AQE again
    spark.conf.set("spark.sql.shuffle.partitions", (2 * servingCores).toString)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // ---- streaming end-to-end ingest (VERDICT r5 #5) ----
    // MemoryStream waves → slim sessionizer (state = one long per open
    // conversation) → epoch spills → ASYNC staged flushes that overlap
    // later waves' arrivals; the post-arrival drain folds the remainder.
    // Corpus sized so the arrival window spans several flush cycles (the
    // configuration the steady-state estimate assumes), ~2-3 min total.
    if (timeLeft > 3 * 60.0) {
      try { emit(streamingSection(spark)) }
      catch {
        case e: Throwable =>
          emit(s""""streaming":{"skipped":"${jsonEscape(
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")}"}""")
      }
    } else {
      skipped += "streaming (deadline)"
      emit(s""""streaming":{"skipped":"deadline"}""")
    }

    // ---- incremental append vs full rebuild (staged/disk path) ----
    // 90/10 split by conv hash, BOTH maintenance modes, best-of-N (the r2
    // single-shot measurement recorded 0.93× under host steal while the
    // builder's repeated runs measured 2.3–3.4× — VERDICT r2 #2). The
    // append target is a fresh COPY of the prebuilt base each run, so every
    // run measures identical work.
    {
      val appendRuns = if (timeLeft < 10 * 60.0) {
        skipped += "append:best_of_2 (deadline, single-shot)"
        1
      } else runs
      case class AppendStat(rebuild: Double, append: Double)
      def appendBench(cosineNorms: Boolean): (Long, AppendStat) = {
        import org.apache.spark.sql.functions._
        val cfg = BuildConfig(cosineNorms = cosineNorms)
        val all = Synth.turns(spark, math.max(1000, nConvs / 4)).cache()
        val totalTurns = all.count()
        val base = all.filter(pmod(xxhash64(col("conv_id")), lit(10)) =!= 0)
        val delta = all.filter(pmod(xxhash64(col("conv_id")), lit(10)) === 0)
        val baseDir = java.nio.file.Files.createTempDirectory("bench-base").toString
        IndexStore.buildAndSave(spark, base, baseDir, cfg)
        var bestRebuild = Double.MaxValue
        var bestAppend = Double.MaxValue
        (1 to appendRuns).foreach { _ =>
          val dirR = java.nio.file.Files.createTempDirectory("bench-rebuild").toString
          bestRebuild = math.min(bestRebuild,
            time(IndexStore.buildAndSave(spark, all, dirR, cfg))._2)
          val dirA = java.nio.file.Files.createTempDirectory("bench-append").toString
          java.nio.file.Files.delete(java.nio.file.Paths.get(dirA))
          copyDir(baseDir, dirA)
          bestAppend = math.min(bestAppend,
            time(IndexStore.append(spark, delta, dirA))._2)
        }
        all.unpersist()
        (totalTurns, AppendStat(bestRebuild, bestAppend))
      }
      val (appendTurns, cosineStat) = appendBench(cosineNorms = true)
      val (_, bm25Stat) = appendBench(cosineNorms = false)
      emit(
        s""""append":{"n_turns_total":$appendTurns,"delta_frac":0.1,"best_of":$appendRuns,""" +
        s""""rebuild_sec":${f"${cosineStat.rebuild}%.3f"},"append_sec":${f"${cosineStat.append}%.3f"},""" +
        s""""speedup":${f"${cosineStat.rebuild / cosineStat.append}%.2f"},""" +
        s""""bm25_only":{"rebuild_sec":${f"${bm25Stat.rebuild}%.3f"},""" +
        s""""append_sec":${f"${bm25Stat.append}%.3f"},""" +
        s""""speedup":${f"${bm25Stat.rebuild / bm25Stat.append}%.2f"}}}""")
    }

    // ---- the SparkEntry operator sweep at the given sfDir ----
    // dominated by fixed per-query cost at sf0.1 table sizes (5k docs):
    // AQE's per-exchange materialization is overhead for every entry,
    // serving and mini-build alike; the scaling pairs above keep it on.
    // Shuffle partitions sized to the DATA (sf0.1 ≈ 5k docs), not the box:
    // with AQE off, a 64-partition exchange on 5k rows is 64 near-empty
    // tasks of pure scheduling per stage for every one of the ~32 entries —
    // the same tasks-per-stage rule IndexView.servingPartitions encodes
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val opTimes: Seq[(String, Double)] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val (_, sec) = time {
          try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        }
        name -> sec
    }
    spark.stop()
    val qs = opTimes.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    emit(s""""queries":$qs,"sf":"$sfDir",""" +
      s""""op_sweep_sec":${f"${opTimes.map(_._2).sum}%.3f"}""")

    val json = mergedJson(partial = false)
    // bare JSON on stdout (build.sbt forwards the forked stdout undecorated)
    // + a file copy so the harness can parse it even through log noise
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), json + "\n")
    ()
  }

  /** End-to-end streaming ingest measurement; returns the JSON fragment.
    * Same protocol as graft.StreamScale, sized for flush/arrival overlap. */
  private def streamingSection(spark: SparkSession): String = {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIndexer
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // state-store partitions: each micro-batch checkpoints EVERY state
      // partition; AQE re-plans per exchange on EVERY micro-batch — both
      // measured fixed costs at streaming's batch sizes (StreamScale)
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val nConvs = sys.env.getOrElse("SPARK_GRAFT_STREAM_CONVS", "160000").toInt
      val waves = sys.env.getOrElse("SPARK_GRAFT_WAVES", "8").toInt
      val T0 = 1577836800000L
      val all = Synth.turns(spark, nConvs).as[Turn].collect()
      val byWave = all.groupBy(t => math.floorMod(t.conv_id.hashCode, waves))
      val waveTurns = (0 until waves).map { w =>
        byWave.getOrElse(w, Array.empty[Turn]).map(t =>
          t.copy(ts = new Timestamp(T0 + w * 60000L + t.turn_idx * 100L)))
      }
      val totalTurns = waveTurns.map(_.length.toLong).sum
      // BM25-only delta appends (the continuously-appending stream's mode);
      // threshold ~ a fifth of the corpus → several async flush cycles
      // overlap the arrival window, with a small post-arrival remainder
      val cfg = BuildConfig(buckets = 4, cosineNorms = false)
      val coalesce = math.max(1L, totalTurns / 5)

      case class StreamRun(arrival: Double, drain: Double, docs: Long) {
        def wall: Double = arrival + drain
      }
      def runOnce(): StreamRun = {
        val dir = java.nio.file.Files.createTempDirectory("bench-stream-idx").toString
        val ckpt = java.nio.file.Files.createTempDirectory("bench-stream-ckpt").toString
        val src = MemoryStream[Turn]
        val t0 = System.nanoTime()
        val q = StreamingIndexer.indexStream(src.toDS(), dir, gapMs = 30000L, ckpt,
          cfg, coalesceTurns = coalesce)
        try {
          waveTurns.foreach { wt =>
            src.addData(wt.toSeq)
            q.processAllAvailable()
          }
          // sentinel conv far in the future: its turn-0 watermark closes the
          // last wave; the sentinel conversation ITSELF stays open, so the
          // doc-count expectation is exactly nConvs
          src.addData(Turn("zz_sentinel", 0, "user", "fin", null,
            new Timestamp(T0 + (waves + 100) * 60000L)))
          q.processAllAvailable()
          src.addData(Turn("zz_sentinel", 1, "user", "fin", null,
            new Timestamp(T0 + (waves + 101) * 60000L)))
          q.processAllAvailable()
        } finally q.stop()
        val arrivalSec = (System.nanoTime() - t0) / 1e9
        val tF = System.nanoTime()
        StreamingIndexer.flushStaged(spark, dir, cfg)
        val flushSec = (System.nanoTime() - tF) / 1e9
        StreamRun(arrivalSec, flushSec, IndexStore.load(spark, dir, cfg).meta.docs)
      }
      // best-of-2 (identical StreamScale configs measured 3× apart under
      // host steal — BENCH/BASELINE.md); the second round is deadline-gated
      var best = runOnce()
      var streamRounds = 1
      if (timeLeft > best.wall * 1.3 + 120) {
        val r2 = runOnce()
        streamRounds = 2
        if (r2.wall < best.wall) best = r2
      } else skipped += "streaming:best_of_2 (deadline, single-shot)"
      s""""streaming":{"convs":$nConvs,"waves":$waves,"turns":$totalTurns,""" +
        s""""coalesce_turns":$coalesce,"best_of":$streamRounds,""" +
        s""""arrival_sec":${f"${best.arrival}%.2f"},""" +
        s""""drain_sec":${f"${best.drain}%.2f"},"wall_sec":${f"${best.wall}%.2f"},""" +
        s""""end_to_end_turns_per_sec":${f"${totalTurns / best.wall}%.0f"},""" +
        s""""arrival_turns_per_sec":${f"${totalTurns / best.arrival}%.0f"},""" +
        s""""indexed_docs":${best.docs},"expected_docs":$nConvs}"""
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
