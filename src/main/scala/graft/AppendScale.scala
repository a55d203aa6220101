package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ir._

/** Append-vs-rebuild probe (perf tooling): 90/10 split, staged/disk path,
  * measured in both maintenance modes — cosine parity (whole-corpus norm
  * pass per append) and BM25-only (delta-only append).
  * SPARK_GRAFT_CPUS / _CONVS / delta via SPARK_GRAFT_DELTA_PCT. */
object AppendScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "100000").toInt
    val deltaPct = sys.env.getOrElse("SPARK_GRAFT_DELTA_PCT", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = Synth.turns(spark, nConvs).cache()
    val n = all.count()
    val base = all.filter(pmod(xxhash64(col("conv_id")), lit(100)) >= deltaPct)
    val delta = all.filter(pmod(xxhash64(col("conv_id")), lit(100)) < deltaPct)
    def t(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (norms <- Seq(true, false)) {
      val cfg = BuildConfig(cosineNorms = norms)
      val dirR = java.nio.file.Files.createTempDirectory("apsc-r").toString
      val rebuild = t(IndexStore.buildAndSave(spark, all, dirR, cfg))
      val dirA = java.nio.file.Files.createTempDirectory("apsc-a").toString
      IndexStore.buildAndSave(spark, base, dirA, cfg)
      val append = t(IndexStore.append(spark, delta, dirA))
      println(f"[appendscale] turns=$n delta=$deltaPct%% cosineNorms=$norms " +
        f"rebuild=$rebuild%.2f append=$append%.2f speedup=${rebuild / append}%.2f")
    }
    spark.stop()
  }
}
