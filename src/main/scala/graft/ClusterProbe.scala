package graft

import org.apache.spark.sql.SparkSession
import graft.ir._

/** Probe: can this sandbox run local-cluster (separate executor JVMs)? */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local-cluster[2,2,2048]")
    val spark = SparkSession.builder()
      .master(master)
      .appName("cluster-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", JvmOpens.forExecutors)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val turns = Synth.turns(spark, 5000).cache()
    val n = turns.count()
    val view = IndexBuilder.build(spark, turns, BuildConfig())
    println(s"[clusterprobe] master=$master turns=$n docs=${view.meta.docs} terms=${view.meta.terms} sec=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
