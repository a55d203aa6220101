package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ir._

/** Dumps the physical plans that back the scale claims (pushdown, broadcast,
  * codegen spans) for PLANS.md. runMain graft.PlanDump <indexDir> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val indexDir = args.headOption.getOrElse("/tmp/graft-demo-index")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val view = IndexStore.load(spark, indexDir, BuildConfig(analyzer = Analyzer.Plain))

    println("==== postings scan with term_id pushdown (parquet-backed) ====")
    spark.read.parquet(s"$indexDir/postings.parquet")
      .filter(col("term_id").isin(3L, 7L, 11L))
      .select("term_id", "first_doc_id", "count")
      .explain("formatted")

    println("==== full BM25 OR search plan ====")
    new Searcher(view).search(spark, "data query fast table window", 10, Or, Bm25)
      .explain("formatted")

    println("==== tf build stage (broadcast docMap) ====")
    val turns = Synth.turns(spark, 2000)
    val docMap = IndexBuilder.zipWithDenseId(
      turns.select("conv_id").distinct(), Seq(col("conv_id")), "doc_id")
      .select("doc_id", "conv_id")
    val analyzeUdf = udf((s: String) => Analyzer.analyze(s, Analyzer.Plain))
    turns.join(broadcast(docMap), "conv_id")
      .select(col("doc_id"), explode(analyzeUdf(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .explain("formatted")

    println("==== AND block-skip: survivor block scan for rare∧hot ====")
    val searcher = new Searcher(view)
    val dict = view.termDict.collect()
    val hot = dict.maxBy(_.df)
    val rare = dict.minBy(_.df)
    val qts = searcher.queryTerms(spark, s"${rare.term} ${hot.term}")
    searcher.andSurvivorBlocks(spark, qts).foreach { surv =>
      surv.explain("formatted")
      val all = view.postings
        .filter(col("term_id").isin(qts.map(_.termId): _*)).count()
      println(s"blocks decoded: ${surv.count()} of $all " +
        s"(rare df=${rare.df}, hot df=${hot.df})")
    }

    println("==== ANN index probe: sig partition pruning (parquet layout) ====")
    val embs = spark.range(0, 2000).selectExpr(
      "id as vec_id",
      "transform(sequence(1, 16), i -> cast(sin(id * i) as float)) as embedding")
    val annDir = java.nio.file.Files.createTempDirectory("plandump-ann").toString
    graft.ops.Similarity.saveAnnIndex(embs, annDir)
    val idx = graft.ops.Similarity.loadAnnIndex(spark, annDir)
    idx.data.filter(col("sig").isin(0, 1, 2, 4, 8)).explain("formatted")

    println("==== IVF index probe: cell partition pruning (parquet layout) ====")
    val ivfDir = java.nio.file.Files.createTempDirectory("plandump-ivf").toString
    graft.ops.Similarity.saveIvfIndex(
      graft.ops.Similarity.buildIvfIndex(embs), ivfDir)
    val ivf = graft.ops.Similarity.loadIvfIndex(spark, ivfDir)
    ivf.data.filter(col("cell").isin(0, 1, 2)).explain("formatted")

    println("==== WAND survivors: pruned block scan decodes via generator ====")
    val wq = dict.sortBy(-_.df).take(3).map(_.term).mkString(" ")
    val wdf = searcher.searchBm25Wand(spark, wq, 10, exactCutover = 0L)
    wdf.count()
    println(wdf.queryExecution.executedPlan.toString)

    spark.stop()
  }
}
