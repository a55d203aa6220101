package graft.ir

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/**
 * Batch append (IndexStore.append): appending new conversations must equal a
 * full rebuild of the union corpus modulo id ASSIGNMENT — terms, df/cf/idf,
 * per-doc stats, posting contents and query scores are identical keyed by
 * (term, conv_id); doc_id/term_id numbering may differ (arrival order vs
 * global rank). Old posting blocks are never rewritten (corpus-stat-free
 * block metadata, Schemas.Block).
 */
class AppendSpec extends SparkSpec {

  // split by conv_id hash parity so the appended batch is NOT the
  // lexicographic tail — append ids then genuinely differ from rebuild ids
  private def batches(n: Int): (DataFrame, DataFrame, DataFrame) = {
    val all = Fixtures.synthTurns(spark, n)
    val b1 = all.filter(abs(xxhash64(col("conv_id"))) % 2 === 0)
    val b2 = all.filter(abs(xxhash64(col("conv_id"))) % 2 === 1)
    (all, b1, b2)
  }

  /** (term, conv_id, tf) postings set, ids resolved through the index's own
    * dict and docMap. */
  private def postingsByKey(v: IndexView): Set[(String, String, Int)] = {
    val terms = v.termDict.collect().map(t => t.term_id -> t.term).toMap
    val convs = v.docMap.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    v.postings.collect().flatMap { b =>
      Codec.decodeBlock(b).map { case (d, tf) => (terms(b.term_id), convs(d), tf) }
    }.toSet
  }

  private def dictByTerm(v: IndexView): Map[String, (Long, Long, Double, Double)] =
    v.termDict.collect()
      .map(t => t.term -> (t.df, t.cf, t.idf, t.bm25_idf)).toMap

  private def statsByConv(v: IndexView): Map[String, (Int, Long, Double)] =
    v.docStats.collect()
      .map(d => d.conv_id -> (d.max_tf, d.doc_len, d.norm)).toMap

  private def scoresByConv(v: IndexView, q: String, scorer: Scorer): Map[String, Double] =
    new Searcher(v).search(spark, q, 1000000, Or, scorer)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap

  test("BM25-only mode: delta-only append equals rebuild; cosine refused") {
    val (all, b1, b2) = batches(100)
    val cfg = BuildConfig(buckets = 4, cosineNorms = false)
    val dirA = graft.SparkSpec.tmpDir("app-b25a")
    IndexStore.buildAndSave(spark, b1, dirA, cfg)
    val appended = IndexStore.append(spark, b2, dirA)
    val dirF = graft.SparkSpec.tmpDir("app-b25f")
    val full = IndexStore.buildAndSave(spark, all, dirF, cfg)

    // the append's doc_stats stage must be the delta-only form — no
    // whole-corpus tf pass anywhere in a BM25-only append
    val stats = IndexStore.readManifest(dirA)("b1:doc_stats")
    assert(stats.detail.contains("delta-only"), stats.detail)

    // BM25 rank+scores identical to the rebuild, keyed by conv_id
    val q = appended.termDict.collect().map(_.term).sorted.take(3).mkString(" ")
    val sa = scoresByConv(appended, q, Bm25)
    val sf = scoresByConv(full, q, Bm25)
    assert(sa.keySet == sf.keySet && sa.keySet.nonEmpty)
    sa.foreach { case (c, s) => assert(math.abs(s - sf(c)) < 1e-9, s"score $c") }

    // stats carry exact max_tf/doc_len, norms are zeroed
    statsByConv(appended).foreach { case (c, (mt, dl, n)) =>
      val (fmt, fdl, _) = statsByConv(full)(c)
      assert(mt == fmt && dl == fdl && n == 0.0, s"stats $c")
    }

    // cosine scoring is refused loudly, not silently empty
    val e = intercept[IllegalArgumentException] {
      new Searcher(appended).search(spark, q, 10, Or, TfIdfCosine).collect()
    }
    assert(e.getMessage.contains("cosineNorms"))
  }

  test("append equals full rebuild modulo id assignment") {
    val (all, b1, b2) = batches(120)
    val dirA = graft.SparkSpec.tmpDir("app-a")
    IndexStore.buildAndSave(spark, b1, dirA, BuildConfig(buckets = 4))
    val appended = IndexStore.append(spark, b2, dirA)

    val dirF = graft.SparkSpec.tmpDir("app-f")
    val full = IndexStore.buildAndSave(spark, all, dirF, BuildConfig(buckets = 4))

    // dictionary: identical stats per term (ids may differ)
    val da = dictByTerm(appended); val df = dictByTerm(full)
    assert(da.keySet == df.keySet)
    da.foreach { case (t, (adf, acf, ai, ab)) =>
      val (fdf, fcf, fi, fb) = df(t)
      assert(adf == fdf && acf == fcf, s"df/cf mismatch for $t")
      assert(math.abs(ai - fi) < 1e-12 && math.abs(ab - fb) < 1e-12, s"idf mismatch for $t")
    }

    // per-doc stats keyed by conv_id
    val sa = statsByConv(appended); val sf = statsByConv(full)
    assert(sa.keySet == sf.keySet)
    sa.foreach { case (c, (amt, adl, an)) =>
      val (fmt, fdl, fn) = sf(c)
      assert(amt == fmt && adl == fdl, s"max_tf/doc_len mismatch for $c")
      assert(math.abs(an - fn) < 1e-12, s"norm mismatch for $c")
    }

    // postings content
    assert(postingsByKey(appended) == postingsByKey(full))

    // meta (block boundaries legitimately differ)
    assert(appended.meta.docs == full.meta.docs)
    assert(appended.meta.terms == full.meta.terms)
    assert(appended.meta.postings == full.meta.postings)
    assert(appended.meta.total_tokens == full.meta.total_tokens)
    assert(math.abs(appended.meta.avgdl - full.meta.avgdl) < 1e-12)

    // rank identity by conv_id: full score maps equal for both scorers
    Seq("alpha beta", "data model training", "zz nonexistent").foreach { q =>
      Seq[Scorer](TfIdfCosine, Bm25).foreach { sc =>
        val ma = scoresByConv(appended, q, sc); val mf = scoresByConv(full, q, sc)
        assert(ma.keySet == mf.keySet, s"matched docs differ for '$q'/$sc")
        ma.foreach { case (c, s) =>
          assert(math.abs(s - mf(c)) < 1e-9, s"score mismatch for $c on '$q'/$sc")
        }
      }
    }

    // WAND on the appended index still equals its exact BM25 (bounds from
    // current stats remain sound after idf/avgdl shifted under the blocks)
    val queryTerms = appended.termDict.collect().map(_.term).sorted.take(4).mkString(" ")
    val exact = new Searcher(appended).search(spark, queryTerms, 10, Or, Bm25)
      .collect().map(r => (r.getString(1), math.rint(r.getDouble(2) * 1e9))).toSeq
    val wand = new Searcher(appended).searchBm25Wand(spark, queryTerms, 10, exactCutover = 0L)
      .collect().map(r => (r.getString(1), math.rint(r.getDouble(2) * 1e9))).toSeq
    assert(wand == exact)
  }

  test("compaction folds batch roots into one index with identical results") {
    val (_, b1, b2) = batches(100)
    val dir = graft.SparkSpec.tmpDir("cmp-src")
    IndexStore.buildAndSave(spark, b1, dir, BuildConfig(buckets = 4))
    // two appends → two batch roots under batches/
    IndexStore.append(spark, b2.filter(abs(xxhash64(col("conv_id"))) % 4 === 1), dir)
    val before = IndexStore.append(spark,
      b2.filter(abs(xxhash64(col("conv_id"))) % 4 === 3), dir)
    assert(IndexStore.committedBatches(IndexStore.readManifest(dir)) == Seq(1, 2))

    val dst = graft.SparkSpec.tmpDir("cmp-dst")
    val compacted = IndexStore.compact(spark, dir, dst)

    // doc ids and conv_ids carried over verbatim
    def ids(v: IndexView) =
      v.docMap.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ids(compacted) == ids(before))
    // postings content identical keyed by (term, conv, tf)
    assert(postingsByKey(compacted) == postingsByKey(before))
    // corpus stats identical
    assert(compacted.meta.docs == before.meta.docs)
    assert(compacted.meta.postings == before.meta.postings)
    assert(compacted.meta.total_tokens == before.meta.total_tokens)
    assert(math.abs(compacted.meta.avgdl - before.meta.avgdl) < 1e-9)
    // query parity on both scorers
    val q = before.termDict.collect().map(_.term).sorted.take(4).mkString(" ")
    Seq[Scorer](TfIdfCosine, Bm25).foreach { sc =>
      val a = scoresByConv(compacted, q, sc); val b = scoresByConv(before, q, sc)
      assert(a.keySet == b.keySet && a.keySet.nonEmpty, s"$sc matched set")
      a.foreach { case (c, s) => assert(math.abs(s - b(c)) < 1e-9, s"$sc $c") }
    }
    // single root: no batch dirs, and further appends start from batch 1
    assert(!Files.exists(Paths.get(s"$dst/batches")))
    assert(IndexStore.committedBatches(IndexStore.readManifest(dst)).isEmpty)
  }

  test("snapshot load (asOf) reproduces each append's exact state") {
    val all = Fixtures.synthTurns(spark, 90)
    val b1 = all.filter(abs(xxhash64(col("conv_id"))) % 3 === 0)
    val b2 = all.filter(abs(xxhash64(col("conv_id"))) % 3 === 1)
    val b3 = all.filter(abs(xxhash64(col("conv_id"))) % 3 === 2)
    val dir = graft.SparkSpec.tmpDir("asof-idx")
    val base = IndexStore.buildAndSave(spark, b1, dir, BuildConfig(buckets = 4))
    val afterB1 = (postingsByKey(base), dictByTerm(base),
      scoresByConv(base, "pais libre", Bm25))
    val mid = IndexStore.append(spark, b2, dir)
    val afterB2 = (postingsByKey(mid), dictByTerm(mid),
      scoresByConv(mid, "pais libre", Bm25))
    IndexStore.append(spark, b3, dir)
    val batches = IndexStore.load(spark, dir) // latest, to discover batch ids
    // base snapshot: asOf = 0
    val s0 = IndexStore.load(spark, dir, asOf = 0)
    assert((postingsByKey(s0), dictByTerm(s0),
      scoresByConv(s0, "pais libre", Bm25)) == afterB1)
    // first-append snapshot: asOf = 1 (batch ids are 1-based, sequential)
    val s1 = IndexStore.load(spark, dir, asOf = 1)
    assert((postingsByKey(s1), dictByTerm(s1),
      scoresByConv(s1, "pais libre", Bm25)) == afterB2)
    assert(s1.meta.docs == mid.meta.docs && s0.meta.docs == base.meta.docs)
    // latest snapshot == plain load
    assert(postingsByKey(IndexStore.load(spark, dir, asOf = 2)) ==
      postingsByKey(batches))
    // unknown snapshot fails loudly
    val e = intercept[IllegalArgumentException](
      IndexStore.load(spark, dir, asOf = 9))
    assert(e.getMessage.contains("not a committed batch"))
  }

  test("old posting files are not rewritten by append") {
    val (_, b1, b2) = batches(80)
    val dir = graft.SparkSpec.tmpDir("app-ro")
    IndexStore.buildAndSave(spark, b1, dir, BuildConfig(buckets = 4))
    val before = Files.walk(Paths.get(s"$dir/postings.parquet")).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    IndexStore.append(spark, b2, dir)
    val after = Files.walk(Paths.get(s"$dir/postings.parquet")).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    assert(before == after, "append touched base posting files")
  }

  test("append is idempotent on re-delivery and resumable after a crash") {
    val (_, b1, b2) = batches(80)
    val dir = graft.SparkSpec.tmpDir("app-res")
    IndexStore.buildAndSave(spark, b1, dir, BuildConfig(buckets = 4))
    val once = IndexStore.append(spark, b2, dir)

    // re-delivering the same batch is a no-op (all convs already indexed)
    val again = IndexStore.append(spark, b2, dir)
    assert(IndexStore.committedBatches(IndexStore.readManifest(dir)) == Seq(1))
    assert(again.meta == once.meta)

    // simulate a crash after b1's tf stage in a second index
    val dir2 = graft.SparkSpec.tmpDir("app-res2")
    IndexStore.buildAndSave(spark, b1, dir2, BuildConfig(buckets = 4))
    IndexStore.append(spark, b2, dir2)
    // truncate via StoreIO so the local Hadoop FS .crc stays consistent
    val manifest = s"$dir2/_manifest.tsv"
    val keep = StoreIO.readLines(manifest).filter { l =>
      val stage = l.split("\t")(0)
      !stage.startsWith("b1:") || Set("b1:begin", "b1:doc_map", "b1:tf").contains(stage)
    }
    StoreIO.writeString(manifest, keep.mkString("", "\n", "\n"))
    def rm(p: String): Unit = {
      val d = Paths.get(p)
      if (Files.exists(d)) Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    Seq("term_dict", "doc_stats", "postings", "index_meta", "build_metrics")
      .foreach(t => rm(s"$dir2/batches/b1/$t.parquet"))

    val tfModifiedBefore =
      Files.getLastModifiedTime(Paths.get(s"$dir2/batches/b1/tf.parquet")).toMillis
    val resumed = IndexStore.append(spark, b2, dir2)
    val tfModifiedAfter =
      Files.getLastModifiedTime(Paths.get(s"$dir2/batches/b1/tf.parquet")).toMillis
    assert(tfModifiedBefore == tfModifiedAfter, "completed append stage was recomputed")
    assert(resumed.meta == once.meta)
    assert(postingsByKey(resumed) == postingsByKey(once))
  }

  test("multi-batch append accumulates; empty-text batch still loads") {
    import spark.implicits._
    val (_, b1, b2) = batches(60)
    val dir = graft.SparkSpec.tmpDir("app-multi")
    IndexStore.buildAndSave(spark, b1, dir, BuildConfig(buckets = 4))
    val v1 = IndexStore.append(spark, b2, dir)
    assert(IndexStore.committedBatches(IndexStore.readManifest(dir)) == Seq(1))

    // a batch whose single conversation analyzes to zero tokens: delta
    // postings are empty, the doc still gets a doc_stats row (doc_len=0)
    val emptyBatch = Seq(
      Turn("zzz_empty_conv", 0, "user", "", null, new java.sql.Timestamp(0L))).toDF()
    val v2 = IndexStore.append(spark, emptyBatch, dir)
    assert(IndexStore.committedBatches(IndexStore.readManifest(dir)) == Seq(1, 2))
    assert(v2.meta.docs == v1.meta.docs + 1)
    assert(v2.meta.postings == v1.meta.postings)
    val row = v2.docStats.filter(col("conv_id") === "zzz_empty_conv").head()
    assert(row.doc_len == 0L && row.max_tf == 0 && row.norm == 0.0)
    // WAND bounds stay sound after TWO appends (idf/avgdl shifted twice
    // under the untouched base blocks): pruned == exact on a multi-term query
    val q = v2.termDict.collect().map(_.term).sorted.take(5).mkString(" ")
    val exact = new Searcher(v2).search(spark, q, 10, Or, Bm25)
      .collect().map(r => (r.getString(1), math.rint(r.getDouble(2) * 1e9))).toSeq
    val wand = new Searcher(v2).searchBm25Wand(spark, q, 10, exactCutover = 0L)
      .collect().map(r => (r.getString(1), math.rint(r.getDouble(2) * 1e9))).toSeq
    assert(wand == exact)
  }
}
