package graft.ir

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/**
 * Persistent index layout + checkpoint-resumable staged build.
 *
 * Iceberg-shaped logical tables materialized as Parquet (no Iceberg runtime
 * jar in the offline sandbox — SURVEY.md §7.3; the schemas and the
 * manifest/lineage discipline are what an Iceberg deployment would get from
 * snapshots):
 *
 *   dir/doc_map.parquet       (doc_id, conv_id)
 *   dir/tf.parquet            (doc_id, term, tf)               [scratch]
 *   dir/term_dict.parquet
 *   dir/doc_stats.parquet
 *   dir/posting_rows.parquet  (bucket-partitioned scratch)
 *   dir/postings.parquet/bucket=K/   (K = term_id % buckets)
 *   dir/index_meta.parquet
 *   dir/build_metrics.parquet
 *   dir/_manifest.tsv         (stage → rows, millis, bytes, lineage)
 *
 * Resume contract (north rule): every stage is recorded in the manifest only
 * after its Parquet output is fully committed; a re-run skips completed
 * stages and recomputes from the persisted outputs of earlier stages, so a
 * build killed mid-postings redoes only the unfinished buckets. Postings are
 * bucketed by term_id so each bucket is an independently restartable unit
 * (the per-partition checkpoint granularity demanded at 10^12-turn scale).
 */
object IndexStore {

  final case class StageRecord(stage: String, rows: Long, millis: Long, bytes: Long, detail: String)

  private def manifestPath(dir: String): Path = Paths.get(dir, "_manifest.tsv")

  private[graft] def readManifest(dir: String): Map[String, StageRecord] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) return Map.empty
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val a = line.split("\t", -1)
        a(0) -> StageRecord(a(0), a(1).toLong, a(2).toLong, a(3).toLong, a(4))
      }.toMap
  }

  private def appendManifest(dir: String, r: StageRecord): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(manifestPath(dir),
      s"${r.stage}\t${r.rows}\t${r.millis}\t${r.bytes}\t${r.detail}\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def dirBytes(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
  }

  /**
   * Staged, resumable build. Returns the loaded IndexView plus the metrics
   * rows written to build_metrics.parquet.
   */
  /** The build config is part of the index (an index is only queryable with
    * the analyzer it was built with — rank identity dies silently otherwise),
    * so it is persisted alongside the tables and restored by load(). */
  private def writeConfig(dir: String, cfg: BuildConfig): Unit = {
    val a = cfg.analyzer
    val lines = Seq(
      s"minLen\t${a.minLen}",
      s"maxLen\t${a.maxLen}",
      s"stopwords\t${a.stopwords.toSeq.sorted.mkString(",")}",
      s"k1\t${cfg.k1}",
      s"b\t${cfg.b}",
      s"saltRange\t${cfg.saltRange}",
      s"buckets\t${cfg.buckets}")
    Files.writeString(Paths.get(dir, "_config.tsv"), lines.mkString("", "\n", "\n"))
  }

  private[graft] def readConfig(dir: String): Option[BuildConfig] = {
    val p = Paths.get(dir, "_config.tsv")
    if (!Files.exists(p)) return None
    val kv = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.contains('\t'))
      .map { l => val a = l.split("\t", -1); a(0) -> (if (a.length > 1) a(1) else "") }
      .toMap
    Some(BuildConfig(
      analyzer = AnalyzerConfig(
        stopwords = kv("stopwords").split(",").filter(_.nonEmpty).toSet,
        minLen = kv("minLen").toInt,
        maxLen = kv("maxLen").toInt),
      k1 = kv("k1").toDouble,
      b = kv("b").toDouble,
      saltRange = kv("saltRange").toLong,
      buckets = kv("buckets").toInt))
  }

  def buildAndSave(
      spark: SparkSession,
      turns: DataFrame,
      dir: String,
      cfg: BuildConfig = BuildConfig()): IndexView = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    readConfig(dir).foreach { stored =>
      require(stored == cfg,
        s"index at $dir was built with a different config; resume must use it " +
          s"(stored=$stored given=$cfg)")
    }
    writeConfig(dir, cfg)
    var done = readManifest(dir)
    val metrics = mutable.ArrayBuffer.empty[BuildMetric]

    /** Run a stage unless the manifest already has it; record lineage. */
    def stage(name: String, detail: String)(body: => Long): Unit = {
      if (done.contains(name)) return
      val t0 = System.nanoTime()
      val rows = body
      val ms = (System.nanoTime() - t0) / 1000000
      val bytes = dirBytes(s"$dir/${name.takeWhile(_ != ':')}.parquet")
      val rec = StageRecord(name, rows, ms, bytes, detail)
      appendManifest(dir, rec)
      done += (name -> rec)
      metrics += BuildMetric(name, detail, rows, bytes, ms, detail)
    }

    val acfg = cfg.analyzer
    val analyzeUdf = udf((s: String) => Analyzer.analyze(s, acfg))

    stage("doc_map", "dense-docId over distinct conv_id") {
      IndexBuilder.zipWithDenseId(
        turns.select("conv_id").distinct(),
        Seq(col("conv_id")), "doc_id")
        .select("doc_id", "conv_id")
        .write.mode("overwrite").parquet(s"$dir/doc_map.parquet")
      spark.read.parquet(s"$dir/doc_map.parquet").count()
    }
    lazy val docMap = spark.read.parquet(s"$dir/doc_map.parquet")

    lazy val nDocs = docMap.count()
    def dim(df: DataFrame, rows: Long): DataFrame =
      if (rows <= IndexBuilder.BroadcastRowLimit) broadcast(df) else df

    stage("tf", "per-turn analyze+explode+hash-agg") {
      turns.join(dim(docMap, nDocs), "conv_id")
        .select(col("doc_id"), explode(analyzeUdf(col("text"))).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("int").as("tf"))
        .write.mode("overwrite").parquet(s"$dir/tf.parquet")
      spark.read.parquet(s"$dir/tf.parquet").count()
    }
    lazy val tf = spark.read.parquet(s"$dir/tf.parquet")

    stage("term_dict", "df/cf+dense-termId") {
      val termAgg = tf.groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      IndexBuilder.zipWithDenseId(
        termAgg, Seq(col("df").desc, col("term").asc), "term_id")
        .withColumn("idf", log10(lit(nDocs.toDouble) / col("df")))
        .withColumn("bm25_idf",
          log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .select("term_id", "term", "df", "cf", "idf", "bm25_idf")
        .write.mode("overwrite").parquet(s"$dir/term_dict.parquet")
      spark.read.parquet(s"$dir/term_dict.parquet").count()
    }
    lazy val termDict = spark.read.parquet(s"$dir/term_dict.parquet")

    lazy val nTerms = termDict.count()

    stage("doc_stats", "maxtf+len+norm") {
      val docAgg = tf
        .join(dim(termDict.select("term", "idf"), nTerms), "term")
        .groupBy("doc_id").agg(
          max("tf").as("max_tf"),
          sum("tf").as("doc_len"),
          sum(pow(col("tf") * col("idf"), 2.0)).as("sq"))
      docMap
        .join(docAgg, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("conv_id"),
          coalesce(col("max_tf"), lit(0)).cast("int").as("max_tf"),
          coalesce(col("doc_len"), lit(0L)).as("doc_len"),
          coalesce(sqrt(col("sq")) / col("max_tf"), lit(0.0)).as("norm"))
        .write.mode("overwrite").parquet(s"$dir/doc_stats.parquet")
      spark.read.parquet(s"$dir/doc_stats.parquet").count()
    }
    lazy val docStats = spark.read.parquet(s"$dir/doc_stats.parquet")
    lazy val avgdl: Double = {
      val r = docStats.agg(avg("doc_len")).head()
      if (r.isNullAt(0) || r.getDouble(0) <= 0) 1.0 else r.getDouble(0)
    }

    stage("posting_rows", "weights+salt+bucket-partitioned scratch") {
      val k1 = cfg.k1; val b = cfg.b; val ad = avgdl
      val parts = math.max(1,
        spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      val saltRange = cfg.resolveSaltRange(nDocs, parts)
      tf.join(dim(termDict.select("term", "term_id", "idf", "bm25_idf"), nTerms), "term")
        .join(dim(docStats.select("doc_id", "max_tf", "doc_len"), nDocs), "doc_id")
        .select(
          col("term_id"),
          (col("doc_id") / lit(saltRange)).cast("long").as("salt"),
          col("doc_id"), col("tf"),
          (col("tf") / col("max_tf") * col("idf")).as("w"),
          (col("bm25_idf") * (col("tf") * (k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b / ad) * col("doc_len")))).as("bw"),
          pmod(col("term_id"), lit(cfg.buckets)).as("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$dir/posting_rows.parquet")
      spark.read.parquet(s"$dir/posting_rows.parquet").count()
    }

    // one independently-resumable job per term_id bucket (partition-pruned
    // read of the scratch table — no rescan of earlier lineage)
    (0 until cfg.buckets).foreach { bkt =>
      stage(s"postings:bucket=$bkt", s"bucket=$bkt") {
        val rows = spark.read.parquet(s"$dir/posting_rows.parquet")
          .filter(col("bucket") === bkt)
        val blocks = rows
          .groupBy("term_id", "salt")
          .agg(sort_array(collect_list(struct(
            col("doc_id"), col("tf"), col("w"), col("bw")))).as("plist"))
          .select(col("term_id"), col("plist"))
          .as[(Long, Seq[(Long, Int, Double, Double)])]
          .flatMap { case (tid, pl) => Codec.buildBlocks(tid, pl.toArray) }
        blocks.write.mode("overwrite").parquet(s"$dir/postings.parquet/bucket=$bkt")
        spark.read.parquet(s"$dir/postings.parquet/bucket=$bkt").count()
      }
    }

    stage("index_meta", "corpus stats") {
      val totalTokens = docStats.agg(coalesce(sum("doc_len"), lit(0L))).head().getLong(0)
      val nPostings = tf.count()
      val nBlocks = spark.read.parquet(s"$dir/postings.parquet").count()
      Seq(IndexMeta(nDocs, termDict.count(), totalTokens, avgdl, nPostings, nBlocks))
        .toDS().write.mode("overwrite").parquet(s"$dir/index_meta.parquet")
      1L
    }

    stage("build_metrics", "lineage+skew") {
      val manifest = readManifest(dir)
      val skew = termDict.agg(max("df").cast("double") / avg("df")).head().getDouble(0)
      val nPostings = tf.count()
      val postingsMs = manifest.collect {
        case (s, r) if s.startsWith("postings:") || s == "posting_rows" => r.millis
      }.sum
      val postingsPerSec =
        if (postingsMs > 0) nPostings * 1000.0 / postingsMs else 0.0
      val rows = manifest.values.toSeq.map(r =>
        BuildMetric(r.stage, r.detail, r.rows, r.bytes, r.millis, r.detail)) ++ Seq(
        BuildMetric("skew_ratio", "max_df/mean_df", skew.toLong, 0, 0, f"$skew%.3f"),
        BuildMetric("postings_per_sec", "build throughput",
          postingsPerSec.toLong, 0, postingsMs, f"$postingsPerSec%.1f"))
      rows.toDS().write.mode("overwrite").parquet(s"$dir/build_metrics.parquet")
      rows.size.toLong
    }

    load(spark, dir, cfg)
  }

  /** Load an index; the persisted build config wins over the caller's
    * default (the analyzer is part of the index, not of the session). */
  def load(spark: SparkSession, dir: String, cfg: BuildConfig = BuildConfig()): IndexView = {
    import spark.implicits._
    val effective = readConfig(dir).getOrElse(cfg)
    val meta = spark.read.parquet(s"$dir/index_meta.parquet").as[IndexMeta].head()
    IndexView(
      termDict = spark.read.parquet(s"$dir/term_dict.parquet").as[TermStat],
      postings = spark.read.parquet(s"$dir/postings.parquet")
        .select("term_id", "first_doc_id", "last_doc_id", "count",
          "doc_ids", "tfs", "max_tf", "block_max_tfidf", "block_max_bm25")
        .as[Block],
      docStats = spark.read.parquet(s"$dir/doc_stats.parquet").as[DocStat],
      docMap = spark.read.parquet(s"$dir/doc_map.parquet"),
      meta = meta,
      cfg = effective)
  }
}
