package graft

import org.apache.spark.sql.SparkSession

import graft.ir._

/** Focused N vs 4N build-throughput probe (perf tooling): exactly Bench's
  * build measurement, nothing else. SPARK_GRAFT_BENCH_N / _CONVS / _RUNS. */
object BuildScale {

  private def newSession(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-buildscale-$cpus")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val nCores = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "2").toInt

    def measure(cpus: Int): (Long, Double) = {
      val spark = newSession(cpus)
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

    val (n, secN) = measure(nCores)
    System.gc()
    val (_, sec4N) = measure(4 * nCores)
    val eff = (secN / sec4N) / 4.0
    println(f"[buildscale] turns=$n N=$nCores secN=$secN%.2f sec4N=$sec4N%.2f " +
      f"thrN=${n / secN}%.0f thr4N=${n / sec4N}%.0f efficiency=$eff%.3f")
  }
}
