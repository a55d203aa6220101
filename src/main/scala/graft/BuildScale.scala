package graft

import org.apache.spark.sql.SparkSession

import graft.ir._

/** Focused N vs 4N build-throughput probe (perf tooling): exactly Bench's
  * build measurement, nothing else. SPARK_GRAFT_BENCH_N / _CONVS / _RUNS;
  * SPARK_GRAFT_CLUSTER=1 measures local-cluster[2,2] → [8,2] (separate
  * executor JVMs) instead of in-JVM thread pairs. */
object BuildScale {

  private def newSession(master: String, parts: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-buildscale")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", JvmOpens.forExecutors)
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val nCores = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "2").toInt
    val cluster = sys.env.get("SPARK_GRAFT_CLUSTER").contains("1")
    val mem = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_MEM", "6144")

    def measure(master: String, parts: Int): (Long, Double) = {
      val spark = newSession(master, parts)
      try {
        val w = Synth.turns(spark, math.max(1000, nConvs / 40), seed = 7L).cache()
        w.count(); IndexBuilder.build(spark, w, BuildConfig()).meta
        w.unpersist(); spark.catalog.clearCache()
        var best = Double.MaxValue
        var n = 0L
        (1 to runs).foreach { r =>
          val turns = Synth.turns(spark, nConvs).cache()
          n = turns.count()
          val t0 = System.nanoTime()
          IndexBuilder.build(spark, turns, BuildConfig()).meta
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          if (r < runs) { spark.catalog.clearCache(); System.gc() }
        }
        (n, best)
      } finally spark.stop()
    }

    val (masterN, partsN, master4N, parts4N) =
      if (cluster) (s"local-cluster[2,2,$mem]", 8, s"local-cluster[8,2,$mem]", 32)
      else (s"local[$nCores]", 2 * nCores, s"local[${4 * nCores}]", 8 * nCores)

    val (n, secN) = measure(masterN, partsN)
    System.gc()
    val (_, sec4N) = measure(master4N, parts4N)
    val eff = (secN / sec4N) / 4.0
    println(f"[buildscale] turns=$n masterN=$masterN secN=$secN%.2f " +
      f"master4N=$master4N sec4N=$sec4N%.2f " +
      f"thrN=${n / secN}%.0f thr4N=${n / sec4N}%.0f efficiency=$eff%.3f")
  }
}
