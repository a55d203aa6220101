package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

import graft.ir._

/** Perf tooling: run ONE real IndexBuilder.build under a job listener and
  * print every Spark job's wall time + call site — locates fixed/serial
  * cost at any master (SPARK_GRAFT_MASTER, e.g. local-cluster[8,2,6144]). */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[8,2,6144]")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "200000").toInt
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-jobprobe")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", JvmOpens.forExecutors)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class J(id: Int, site: String, start: Long, var end: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (capture) {
        val site = e.stageInfos.lastOption.map(s =>
          s"${s.name} [${e.stageInfos.map(_.numTasks).sum} tasks/${e.stageInfos.length} stages]")
          .getOrElse("?")
        jobs.synchronized { jobs(e.jobId) = J(e.jobId, site, e.time) }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (capture) {
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      }
    })

    val w = Synth.turns(spark, math.max(1000, nConvs / 40), seed = 7L).cache()
    w.count(); IndexBuilder.build(spark, w, BuildConfig()).meta
    w.unpersist(); spark.catalog.clearCache()
    val turns = Synth.turns(spark, nConvs).cache()
    println(s"[jobprobe] master=$master parts=$parts turns=${turns.count()}")

    // run 1 warms JIT on the full-size input; run 2 is the profiled build
    IndexBuilder.build(spark, turns, BuildConfig()).meta
    spark.catalog.clearCache()
    turns.cache().count()

    capture = true
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, turns, BuildConfig()).meta
    val wall = (System.nanoTime() - t0) / 1e9
    capture = false

    val js = jobs.synchronized(jobs.values.toSeq)
    val sumJobs = js.map(j => (j.end - j.start) / 1e3).sum
    println(f"[jobprobe] build wall=$wall%.2f s, ${js.length} jobs, " +
      f"sum(job)=$sumJobs%.2f s, gaps=${wall - sumJobs}%.2f s")
    js.foreach { j =>
      println(f"[jobprobe]   job ${j.id}%3d ${(j.end - j.start) / 1e3}%7.2f s  ${j.site}")
    }
    spark.stop()
  }
}
