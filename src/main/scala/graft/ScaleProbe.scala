package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ir._

/** Isolation probe: shuffle-free analyze throughput vs core count, then the
  * same with one hash-agg shuffle (perf diagnosis only). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toInt
    for (cpus <- Seq(2, 8, 32)) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val turns = Synth.turns(spark, nConvs).cache()
      val n = turns.count()
      val acfg = Analyzer.Plain
      val analyzeUdf = udf((s: String) => Analyzer.analyze(s, acfg))
      def t(body: => Any): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val mapOnly = t {
        turns.select(size(analyzeUdf(col("text"))).as("n")).agg(sum("n")).head()
      }
      val withShuffle = t {
        turns.select(explode(analyzeUdf(col("text"))).as("term"))
          .groupBy("term").count().count()
      }
      println(f"[probe] cpus=$cpus%2d turns=$n mapOnly=$mapOnly%7.2f s (${n / mapOnly}%9.0f/s)  " +
        f"agg=$withShuffle%7.2f s (${n / withShuffle}%9.0f/s)")
      spark.stop()
    }
  }
}
