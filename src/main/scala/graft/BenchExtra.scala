package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Optimization-round profiling harness (guide §1.4): replays the driver
 * bench's operator sweep environment EXACTLY (local[$SPARK_GRAFT_CPUS],
 * shuffle.partitions=16, AQE off, sweep order = sorted query names) but adds
 * per-query job/stage accounting and a second (warm) run per query so the
 * once-per-corpus memoized costs (Pipelines.index build, saveView, ANN/IVF
 * training) separate from the steady-state query cost. Bench.scala itself is
 * frozen for measurement — extra numbers live here and in OPTIMIZATION_r07.md.
 *
 *   sbt "runMain graft.BenchExtra [queryName ...]"
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new LongAdder
    val taskMs = new LongAdder
    val stages = new LongAdder
    val tasks = new LongAdder
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.increment()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.increment()
        tasks.add(si.numTasks)
        taskMs.add(si.taskMetrics.executorRunTime)
        if (verbose)
          println(f"[bx]    stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"taskTime=${si.taskMetrics.executorRunTime / 1000.0}%7.3fs " +
            f"name=${si.name.take(60)}")
      }
    })
    verbose = sys.env.get("SPARK_GRAFT_BX_VERBOSE").exists(_ == "1")

    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    def measure(label: String, n: String): Double = {
      Thread.sleep(150) // let stage-completed events drain into the adders
      jobs.reset(); taskMs.reset(); stages.reset(); tasks.reset()
      spark.sparkContext.setJobDescription(s"bx:$n")
      val t0 = System.nanoTime()
      val c = try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable => println(s"[bx] $n FAILED: $e"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"[bx] $label $n%-18s ${sec}%8.3f s  jobs=${jobs.sum}%3d " +
        f"stages=${stages.sum}%3d tasks=${tasks.sum}%4d " +
        f"taskTime=${taskMs.sum / 1000.0}%8.3f s  rows=$c")
      sec
    }
    var coldTotal = 0.0
    names.foreach { n => coldTotal += measure("cold", n) }
    println(f"[bx] cold sweep total ${coldTotal}%8.3f s")
    var warmTotal = 0.0
    names.foreach { n => warmTotal += measure("warm", n) }
    println(f"[bx] warm sweep total ${warmTotal}%8.3f s")
    spark.stop()
  }
}
