package graft

import org.apache.spark.sql.SparkSession

import graft.ir._
import graft.ops.Pipelines

/**
 * Benchmark main (driver contract): prints ONE JSON line with the round's
 * numbers against BASELINE.md:
 *
 *  - index-build throughput (turns/sec) at two parallelism levels
 *    (local[8] vs local[32] on the identical deterministic input — the
 *    sandbox stand-in for N vs 4N executors) + scaling efficiency
 *  - top-k query latency (p50/p95 over the 13 reference bot queries,
 *    repeated) on the built index
 *  - per-query timings for the SparkEntry operator set at the given sfDir
 */
object Bench {

  private def newSession(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "40000").toInt

    // ---- build throughput at two parallelism levels, identical input ----
    def buildOnce(cpus: Int): (Long, Double) = {
      val spark = newSession(cpus)
      try {
        val turns = Synth.turns(spark, nConvs).cache()
        val nTurns = turns.count() // materialize input outside the timed span
        val (view, sec) = time {
          val v = IndexBuilder.build(spark, turns, BuildConfig())
          v.meta // forces the full lineage (meta counts every table)
        }
        (nTurns, sec)
      } finally spark.stop()
    }

    val (nTurns8, sec8) = buildOnce(8)
    val (_, sec32) = buildOnce(32)
    val thr8 = nTurns8 / sec8
    val thr32 = nTurns8 / sec32
    val efficiency = (sec8 / sec32) / 4.0

    // ---- query latency on the synth index + operator timings at sfDir ----
    val spark = newSession(32)
    val latencies = try {
      val view = IndexBuilder.build(spark, Synth.turns(spark, nConvs), BuildConfig())
      val searcher = new Searcher(view)
      searcher.search(spark, "pais libre", 10).count() // warm
      (1 to 4).flatMap(_ => botQueries.map { q =>
        time(searcher.search(spark, q, 10, Or, Bm25).count())._2
      })
    } finally ()
    val sorted = latencies.sorted
    def pct(p: Double) = sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    val p50 = pct(0.50)
    val p95 = pct(0.95)

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
    val total = sec8 + sec32 + opTimes.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""build":{"n_turns":$nTurns8,"sec_local8":${f"$sec8%.3f"},"sec_local32":${f"$sec32%.3f"},""" +
      s""""turns_per_sec_local8":${f"$thr8%.1f"},"turns_per_sec_local32":${f"$thr32%.1f"},""" +
      s""""scaling_efficiency":${f"$efficiency%.3f"}},""" +
      s""""query_latency":{"p50_sec":${f"$p50%.4f"},"p95_sec":${f"$p95%.4f"},"n":${latencies.length}}}""")
  }
}
