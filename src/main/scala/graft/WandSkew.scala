package graft

import org.apache.spark.sql.SparkSession

import graft.ir._

/**
 * Block-max pruning demonstration probe (VERDICT r4 #8): every earlier
 * measurement showed 0% blocks pruned because the homogeneous bench corpus
 * has flat score distributions — sound bounds with no power. This probe
 * runs the SAME serving path on `Synth.skewedTurns` (hot docId-clustered
 * high-tf docs + a cold long-doc tail) and records:
 *   - candidate vs surviving block counts from the serving `wandPlan`
 *     (the probe counts exactly what serving decodes),
 *   - best-of-N wall for exact vs forced-pruning WAND,
 *   - a hard equality check between the two result lists.
 * SPARK_GRAFT_BENCH_CONVS / SPARK_GRAFT_CPUS override.
 */
object WandSkew {

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "200000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val turns = Synth.skewedTurns(spark, nConvs).cache()
    turns.count()
    val built = IndexBuilder.build(spark, turns, BuildConfig())
    spark.conf.set("spark.sql.shuffle.partitions",
      IndexView.servingPartitions(built.meta, spark).toString)
    val view = built.pin()
    view.termLookup; view.wandTermBounds
    val searcher = new Searcher(view)
    // a CONSECUTIVE HotVocab triple: skewedTurns gives each hot doc terms
    // (ci, ci+1, ci+2) mod |HotVocab|, so these three CO-OCCUR at high tf in
    // ~1/17 of hot docs — θ then reaches a 3-term total, which is what the
    // prune condition needs to clear the other terms' global-max slack
    // (disjoint hot terms leave θ at one contribution and nothing prunes,
    // correctly: the top-k is then genuinely spread across the corpus)
    val query = "pais cultura produccion"
    val k = 10

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Double)] =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 1e9 + 0.5) / 1e9)).toSeq
    val exact = rows(searcher.search(spark, query, k, Or, Bm25))
    val pruned = rows(searcher.searchBm25Wand(spark, query, k, exactCutover = 0L))
    require(exact == pruned,
      s"pruned result diverged from exact!\nexact=$exact\npruned=$pruned")

    val qts = searcher.queryTerms(spark, query)
    val (cand, surv) = searcher.wandPlan(spark, qts, k)
    val nc = cand.count()
    val ns = surv.count()

    def t(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val exactSec = (1 to 3).map(_ =>
      t(searcher.search(spark, query, k, Or, Bm25).count())).min
    val wandSec = (1 to 3).map(_ =>
      t(searcher.searchBm25Wand(spark, query, k, exactCutover = 0L).count())).min

    println(f"[wandskew] convs=$nConvs terms=${qts.length} " +
      f"candidate_blocks=$nc survivor_blocks=$ns " +
      f"pruned_frac=${1.0 - ns.toDouble / nc}%.3f " +
      f"exact_sec=$exactSec%.3f wand_sec=$wandSec%.3f identical=true")
    spark.stop()
  }
}
