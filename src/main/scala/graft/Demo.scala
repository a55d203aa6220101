package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ir._

/**
 * Minimal end-to-end CLI (the Spark-native analog of the reference's
 * IR client): build (or resume) an index from a transcript table derived
 * from a documents parquet, then answer free-text queries.
 *
 * Usage: runMain graft.Demo <sfDir> <indexDir> <query...>
 *        runMain graft.Demo --append <sfDir> <indexDir> <query...>
 *          (splits the corpus in half: builds on half A, appends half B,
 *           then queries the combined index — drives IndexStore.append)
 *        runMain graft.Demo --compact <sfDir> <indexDir> <query...>
 *          (build + append as above, then compact the batch roots into
 *           <indexDir>-compacted and serve queries from THAT — drives
 *           IndexStore.compact end-to-end)
 *        runMain graft.Demo --batch <sfDir> <indexDir> <query...>
 *          (scores ALL queries in ONE Spark job — drives
 *           Searcher.searchBatch end-to-end)
 *        runMain graft.Demo --delete <sfDir> <indexDir> <query...>
 *          (build, tombstone-delete half the first query's matches, query
 *           again, then compact and query the folded index — drives
 *           IndexStore.delete end-to-end)
 */
object Demo {
  def main(args: Array[String]): Unit = {
    val compactMode = args.headOption.contains("--compact")
    val appendMode = args.headOption.contains("--append") || compactMode
    val batchMode = args.headOption.contains("--batch")
    val deleteMode = args.headOption.contains("--delete")
    val rest = if (appendMode || batchMode || deleteMode) args.drop(1) else args
    val sfDir = if (rest.length > 0) rest(0) else "/root/testdata/sf0.001"
    val indexDir = if (rest.length > 1) rest(1) else "/tmp/graft-demo-index"
    val queries = if (rest.length > 2) rest.drop(2).toSeq
      else Seq("data query fast", "spark window merge", "the slow table")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus: a documents.parquet dir (rows → single-turn conversations,
    // FIXTURES.md §5) or any directory of text files (reference-style
    // corpus walk, one file = one conversation)
    val turns =
      if (new java.io.File(s"$sfDir/documents.parquet").exists())
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(
            format_string("d%012d", col("doc_id")).as("conv_id"),
            lit(0).as("turn_idx"),
            lit("user").as("role"),
            col("text"),
            lit(null).cast("string").as("tool"),
            lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")).as("ts"))
      else graft.ir.Sources.fromTextDir(spark, sfDir)

    val cfg = BuildConfig(analyzer = Analyzer.Plain)
    val view =
      if (appendMode) {
        val a = turns.filter(abs(xxhash64(col("conv_id"))) % 2 === 0)
        val b = turns.filter(abs(xxhash64(col("conv_id"))) % 2 === 1)
        val base = IndexStore.buildAndSave(spark, a, indexDir, cfg)
        println(s"[demo] base index: docs=${base.meta.docs} terms=${base.meta.terms}")
        val appended = IndexStore.append(spark, b, indexDir)
        if (compactMode) {
          val dst = s"$indexDir-compacted"
          val c = IndexStore.compact(spark, indexDir, dst)
          println(s"[demo] compacted to $dst: docs=${c.meta.docs} " +
            s"(batch roots folded into one)")
          c
        } else appended
      } else IndexStore.buildAndSave(spark, turns, indexDir, cfg)
    println(s"[demo] index: docs=${view.meta.docs} terms=${view.meta.terms} " +
      s"postings=${view.meta.postings} blocks=${view.meta.blocks} avgdl=${view.meta.avgdl}")

    if (deleteMode) {
      val q = queries.head
      val s0 = new Searcher(view)
      val before = s0.search(spark, q, 1000000, Or, Bm25).collect()
      val victims = before.map(_.getString(1)).sorted.take(math.max(1, before.length / 2))
      println(s"[demo] '$q' matches ${before.length} docs; tombstoning ${victims.length}")
      val n = IndexStore.delete(spark, victims.toSeq, indexDir)
      val after = new Searcher(IndexStore.load(spark, indexDir))
        .search(spark, q, 1000000, Or, Bm25).collect()
      println(s"[demo] deleted=$n; '$q' now matches ${after.length} " +
        s"(survivors keep exact scores until compact)")
      val dst = s"$indexDir-compacted"
      val folded = IndexStore.compact(spark, indexDir, dst)
      val fin = new Searcher(folded).search(spark, q, 5, Or, Bm25).collect()
      println(s"[demo] compacted to $dst: docs=${folded.meta.docs}; top hits after fold:")
      fin.foreach(r => println(f"    ${r.getString(1)}  ${r.getDouble(2)}%.6f"))
      spark.stop()
      return
    }

    val searcher = new Searcher(view.pin()) // serving mode: hot tables cached
    if (batchMode) {
      val batch = queries.zipWithIndex.map { case (q, i) => (s"q$i", q) }
      println(s"[demo] batch: ${batch.length} queries in one job (BM25 OR)")
      searcher.searchBatch(spark, batch, 5).collect()
        .sortBy(r => (r.getString(0), r.getInt(4)))
        .foreach(r => println(
          f"    ${r.getString(0)}  #${r.getInt(4)}  ${r.getString(2)}  ${r.getDouble(3)}%.6f"))
      spark.stop()
      return
    }
    queries.foreach { q =>
      println(s"[demo] query: '$q'")
      println("  tf-idf cosine OR:")
      searcher.search(spark, q, 5, Or, TfIdfCosine).collect().foreach(r =>
        println(f"    ${r.getString(1)}  ${r.getDouble(2)}%.6f"))
      println("  BM25 OR:")
      searcher.search(spark, q, 5, Or, Bm25).collect().foreach(r =>
        println(f"    ${r.getString(1)}  ${r.getDouble(2)}%.6f"))
      println("  BM25 WAND:")
      searcher.searchBm25Wand(spark, q, 5).collect().foreach(r =>
        println(f"    ${r.getString(1)}  ${r.getDouble(2)}%.6f"))
      println("  BM25 AND:")
      searcher.search(spark, q, 5, And, Bm25).collect().foreach(r =>
        println(f"    ${r.getString(1)}  ${r.getDouble(2)}%.6f"))
    }
    spark.stop()
  }
}
