package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ir._

/**
 * Shared derivations over the driver's testdata (`TESTDATA.md`), and a
 * per-sfDir memo of the built inverted index so the driver's Verify/Bench
 * runs build once and reuse across queries.
 */
object Pipelines {

  /** Fixed free-text query used by the SQL-oracled search queries (all five
    * terms exist in every sf corpus vocabulary, each with query-tf 1). */
  val FixedQuery = "data query fast table window"

  /** documents.parquet rows → single-turn conversations (FIXTURES.md §5). */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        format_string("d%012d", col("doc_id")).as("conv_id"),
        lit(0).as("turn_idx"),
        lit("user").as("role"),
        col("text"),
        lit(null).cast("string").as("tool"),
        lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")).as("ts"))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Analyzer profile for the English testdata corpus: no stopwords (keeps
    * the DuckDB oracle SQL a plain split+length filter), length [3,23]. */
  val Cfg: BuildConfig = BuildConfig(analyzer = Analyzer.Plain)

  private val indexMemo = new ConcurrentHashMap[String, IndexView]()
  private val annMemo = new ConcurrentHashMap[String, Similarity.AnnIndex]()

  /** Build (once per sfDir per JVM) the persistent-signature ANN index over
    * the embeddings table — serving semantics: ingest once, probe per query. */
  def annIndex(spark: SparkSession, sfDir: String): Similarity.AnnIndex =
    annMemo.computeIfAbsent(sfDir, dir =>
      Similarity.buildAnnIndex(embeddings(spark, dir)))

  private val ivfMemo = new ConcurrentHashMap[String, Similarity.IvfIndex]()

  /** Once-per-sfDir IVF index (trained coarse quantizer + cell-clustered
    * vectors) — the data-adaptive counterpart of annIndex. */
  def ivfIndex(spark: SparkSession, sfDir: String): Similarity.IvfIndex =
    ivfMemo.computeIfAbsent(sfDir, dir =>
      Similarity.buildIvfIndex(embeddings(spark, dir)))

  /** The ANN/IVF index built by this JVM's query run, if exactly one sfDir
    * was exercised — SparkEntry.oracleSql embeds its geometry (planes /
    * centroids) into the contract-verification SQL after Verify has run the
    * queries. None (→ rows-only check) when nothing or several were built. */
  def builtAnn: Option[Similarity.AnnIndex] = {
    import scala.jdk.CollectionConverters._
    annMemo.values.asScala.toList match { case idx :: Nil => Some(idx); case _ => None }
  }

  def builtIvf: Option[Similarity.IvfIndex] = {
    import scala.jdk.CollectionConverters._
    ivfMemo.values.asScala.toList match { case idx :: Nil => Some(idx); case _ => None }
  }

  /** Build (once per sfDir per JVM) the full inverted index over the
    * documents corpus, pinned in the serving layout (term_id-clustered
    * postings, doc_id-co-partitioned stats). All IR queries below read from
    * these tables, so the DuckDB oracle validates the entire build pipeline
    * including the block codec and salting. */
  def index(spark: SparkSession, sfDir: String): IndexView =
    indexMemo.computeIfAbsent(sfDir, dir =>
      IndexBuilder.build(spark, transcripts(spark, dir), Cfg).pin())

  /** Engine-internal doc_id → original documents.doc_id (parse the conv_id
    * the transcript mapping minted; never assume the dense ranks align). */
  private def origId(c: org.apache.spark.sql.Column) =
    substring(c, 2, 18).cast("long")

  private val delMemo = new ConcurrentHashMap[String, IndexView]()

  /** The X21 tombstone-delete pipeline end-to-end (once per sfDir per JVM):
    * staged build to a store → victims = `Dedup.exact` non-keepers ∪ a
    * deterministic slice (doc_id % 7 == 3, so deletion bites even on a
    * dup-free corpus) → `IndexStore.delete` → serving view loaded with the
    * tombstones applied. Deleted docs vanish from every result immediately;
    * corpus stats (df/idf/avgdl) stay as built until compact — exactly what
    * the x21 oracle models (full-corpus BM25 restricted to survivors). */
  def deletedIndex(spark: SparkSession, sfDir: String): IndexView =
    delMemo.computeIfAbsent(sfDir, dir => {
      val store = java.nio.file.Files.createTempDirectory("graft-x21-idx").toString
      // persist the ALREADY-memoized in-memory index (compact-style: text
      // never re-read or re-tokenized — VERDICT r5 #7) instead of a second
      // full buildAndSave over the transcripts
      IndexStore.saveView(spark, index(spark, dir), store)
      val docs = documents(spark, dir)
      val nonKeepers = docs
        .select(col("doc_id"), md5(col("text")).as("h"))
        .join(Dedup.exact(docs).select("h", "keeper"), "h")
        .filter(col("doc_id") =!= col("keeper"))
        .select("doc_id")
      val victims = nonKeepers
        .union(docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"))
        .select(format_string("d%012d", col("doc_id")).as("conv_id"))
      IndexStore.delete(spark, victims, store)
      IndexStore.load(spark, store)
    })

  /** X21 driver query: BM25 top-k over the tombstoned index, original ids. */
  def searchDeleted(spark: SparkSession, sfDir: String, query: String, k: Int): DataFrame =
    new Searcher(deletedIndex(spark, sfDir)).search(spark, query, k, Or, Bm25)
      .select(origId(col("conv_id")).as("doc_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)

  /** doc_id joinable view of doc_stats with original ids. */
  def docStatsOrig(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).docStats.toDF()
      .withColumn("doc_id_orig", origId(col("conv_id")))

  /** Decoded postings with term strings and original doc ids — the
    * round-trip through dense ids, salting and the block codec. */
  def decodedTf(spark: SparkSession, sfDir: String): DataFrame = {
    val view = index(spark, sfDir)
    val decoded = Exports.decodedPostings(view)
      .withColumnRenamed("doc_id", "doc_id_dense")
    decoded
      .join(view.termDict.toDF().select("term_id", "term"), "term_id")
      .join(view.docMap.select(col("doc_id").as("doc_id_dense"),
        origId(col("conv_id")).as("doc_id")), "doc_id_dense")
      .select("doc_id", "term", "tf")
  }

  /** Run the searcher and map hits back to original doc ids, rounded for
    * oracle comparison; ordering on the rounded score (ties → doc_id) so
    * both sides sort identically. */
  def searchOrig(
      spark: SparkSession, sfDir: String, query: String, k: Int,
      mode: QueryMode, scorer: Scorer): DataFrame = {
    val searcher = new Searcher(index(spark, sfDir))
    searcher.search(spark, query, k, mode, scorer)
      .select(origId(col("conv_id")).as("doc_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Batch search mapped to original doc ids (oracle comparison shape). */
  def searchBatchOrig(
      spark: SparkSession, sfDir: String,
      queries: Seq[(String, String)], k: Int): DataFrame =
    new Searcher(index(spark, sfDir)).searchBatch(spark, queries, k, Bm25)
      .select(col("query_id"), origId(col("conv_id")).as("doc_id"),
        round(col("score"), 6).as("score"), col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))

  def searchWand(spark: SparkSession, sfDir: String, query: String, k: Int): DataFrame = {
    val searcher = new Searcher(index(spark, sfDir))
    searcher.searchBm25Wand(spark, query, k)
      .select(origId(col("conv_id")).as("doc_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }
}
