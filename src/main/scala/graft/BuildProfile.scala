package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ir._

/** Stage-by-stage build profiler (perf work only, not part of the contract).
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_CONVS control the run. */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val turns = Synth.turns(spark, nConvs).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[profile] cpus=$cpus turns=${turns.count()}")
    // JIT warm
    IndexBuilder.build(spark, Synth.turns(spark, nConvs / 40, 7L), BuildConfig()).meta
    spark.catalog.clearCache()
    turns.persist(StorageLevel.MEMORY_AND_DISK).count()

    val cfg = BuildConfig()
    val docMap = t("docMap") {
      val d = IndexBuilder.zipWithDenseId(
        turns.select("conv_id").distinct(), Seq(col("conv_id")), "doc_id")
        .select("doc_id", "conv_id").persist(StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val nDocs = docMap.count()
    val acfg = cfg.analyzer
    val analyzeUdf = udf((s: String) => Analyzer.analyze(s, acfg))
    val tf = t("tf") {
      val x = turns.select(col("conv_id"), explode(analyzeUdf(col("text"))).as("term"))
        .groupBy("conv_id", "term").agg(count(lit(1)).cast("int").as("tf"))
        .join(docMap, "conv_id")
        .select("doc_id", "term", "tf")
        .persist(StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val termDict = t("termDict") {
      val agg = tf.groupBy("term").agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      val x = IndexBuilder.zipWithDenseId(agg, Seq(col("df").desc, col("term").asc), "term_id")
        .withColumn("idf", log10(lit(nDocs.toDouble) / col("df")))
        .withColumn("bm25_idf", log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .persist(StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val tfIds = t("tfJoinDict") {
      val x = tf.join(termDict.select("term", "term_id", "idf", "bm25_idf"), "term")
        .select("doc_id", "term_id", "tf", "idf", "bm25_idf")
        .persist(StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val docStats = t("docStats") {
      val docAgg = tfIds.groupBy("doc_id").agg(
        max("tf").as("max_tf"), sum("tf").as("doc_len"),
        sum(pow(col("tf") * col("idf"), 2.0)).as("sq"))
      val x = docMap.join(docAgg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("conv_id"),
          coalesce(col("max_tf"), lit(0)).cast("int").as("max_tf"),
          coalesce(col("doc_len"), lit(0L)).as("doc_len"),
          coalesce(sqrt(col("sq")) / col("max_tf"), lit(0.0)).as("norm"))
        .as[DocStat].persist(StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    t("postingsJoin") {
      // isolate: the tf×docStats join + salt/weight projection only
      tfIds.join(docStats.select("doc_id", "max_tf", "doc_len"), "doc_id")
        .select(col("term_id"), col("doc_id"), col("tf")).count()
    }
    t("postings") {
      val x = IndexBuilder.buildPostings(spark, tfIds.toDF(), docStats,
        cfg.resolveSaltRange(nDocs, 2 * cpus))
      x.count()
    }
    spark.stop()
  }
}
