package graft

import org.apache.spark.sql.SparkSession
import graft.ir._

/** Probe: can this sandbox run local-cluster (separate executor JVMs)? */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local-cluster[2,2,2048]")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
      "java.security.jgss/sun.security.krb5")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(master)
      .appName("cluster-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", addOpens)
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
