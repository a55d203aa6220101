package graft

import org.apache.spark.sql.SparkSession

import graft.ir._

/** End-to-end in-memory build timing at bench scale (r7 A/B harness):
  * replicates Bench.measureOnce (warmup build, cached synth turns, timed
  * IndexBuilder.build) without the Bench contract. Env: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_CONVS, SPARK_GRAFT_BUILD_RUNS. */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BUILD_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = Synth.turns(spark, math.max(1000, nConvs / 40), seed = 7L).cache()
    w.count()
    IndexBuilder.build(spark, w, BuildConfig()).meta // JIT warm
    w.unpersist()
    spark.catalog.clearCache()
    val turns = Synth.turns(spark, nConvs).cache()
    val n = turns.count()
    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val view = IndexBuilder.build(spark, turns, BuildConfig())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[buildbench] run=$r cpus=$cpus convs=$nConvs turns=$n sec=$sec%.3f")
      view.unpin() // release build caches between runs
    }
    spark.stop()
  }
}
