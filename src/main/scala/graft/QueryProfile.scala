package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.ir._

/** One-query profile: jobs, stages, task counts, summed task time vs wall. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = Synth.turns(spark, nConvs).cache()
    turns.count()
    val view = IndexBuilder.build(spark, turns, BuildConfig()).pin()
    view.termLookup; view.wandTermBounds
    val searcher = new Searcher(view)
    searcher.search(spark, "pais libre", 10).count() // warm
    @volatile var log = false
    val jobs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (log) jobs.increment()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (log) {
        val si = sc.stageInfo
        println(f"[qp]   stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"taskTime=${si.taskMetrics.executorRunTime / 1000.0}%7.3fs " +
          f"cpuTime=${si.taskMetrics.executorCpuTime / 1e9}%7.3fs name=${si.name.take(40)}")
      }
    })
    for (q <- Seq("pais", "pais libre", "universidad riqueza atletismo argentina estado nacion edificio comunicacion")) {
      log = true
      val t0 = System.nanoTime()
      searcher.search(spark, q, 10, Or, Bm25).count()
      val wall = (System.nanoTime() - t0) / 1e9
      log = false
      Thread.sleep(300)
      println(f"[qp] query='$q' wall=$wall%.3fs jobs=${jobs.sum}")
      jobs.reset()
    }
    spark.stop()
  }
}
