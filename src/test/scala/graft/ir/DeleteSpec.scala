package graft.ir

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Tombstone deletes (IndexStore.delete): the missing half of the dedup
 * pipeline — deleted docs vanish from every query path immediately (load
 * anti-joins doc_map/doc_stats), surviving docs keep their exact scores
 * until compact, and delete+compact is equivalent to a rebuild without the
 * deleted conversations (dict, stats, postings, scores — keyed by term /
 * conv_id, ids may differ).
 */
class DeleteSpec extends SparkSpec {

  private def dictByTerm(v: IndexView): Map[String, (Long, Long)] =
    v.termDict.collect().map(t => t.term -> (t.df, t.cf)).toMap

  private def statsByConv(v: IndexView): Map[String, (Int, Long, Double)] =
    v.docStats.collect()
      .map(d => d.conv_id -> (d.max_tf, d.doc_len, d.norm)).toMap

  private def scoresByConv(v: IndexView, q: String, scorer: Scorer = Bm25): Map[String, Double] =
    new Searcher(v).search(spark, q, 1000000, Or, scorer)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap

  test("delete hides docs from all query paths; survivors keep exact scores") {
    val dir = graft.SparkSpec.tmpDir("del-basic")
    IndexStore.buildAndSave(spark, Fixtures.synthTurns(spark, 100), dir,
      BuildConfig(buckets = 4))
    val before = IndexStore.load(spark, dir)
    val q = before.termDict.collect().map(_.term).sorted.take(3).mkString(" ")
    val sb = scoresByConv(before, q)
    assert(sb.size >= 6, "fixture: need enough matches to delete some")
    val victims = sb.keySet.toSeq.sorted.take(3)

    assert(IndexStore.delete(spark, victims, dir) == 3L)
    val after = IndexStore.load(spark, dir)
    val sa = scoresByConv(after, q)
    // deleted conversations are gone from BM25, cosine, WAND and AND paths
    assert(sa.keySet == sb.keySet -- victims)
    assert(victims.forall(c => !scoresByConv(after, q, TfIdfCosine).contains(c)))
    val wand = new Searcher(after).searchBm25Wand(spark, q, 1000000, exactCutover = 0L)
      .collect().map(_.getString(1)).toSet
    assert(victims.forall(c => !wand.contains(c)))
    // survivors score EXACTLY as before (stats stay as built until compact)
    sa.foreach { case (c, s) => assert(s == sb(c), s"survivor score drift $c") }
    // double delete and unknown convs are no-ops
    assert(IndexStore.delete(spark, victims, dir) == 0L)
    assert(IndexStore.delete(spark, Seq("no-such-conv"), dir) == 0L)
  }

  test("delete + compact equals a rebuild without the deleted docs") {
    import spark.implicits._
    val dir = graft.SparkSpec.tmpDir("del-cmp")
    val all = Fixtures.synthTurns(spark, 120)
    IndexStore.buildAndSave(spark, all, dir, BuildConfig(buckets = 4))
    val convs = IndexStore.load(spark, dir).docMap
      .collect().map(_.getString(1)).sorted
    val victims = convs.filter(c => math.abs(c.hashCode) % 5 == 0).toSeq
    assert(victims.nonEmpty && IndexStore.delete(spark, victims, dir) == victims.length.toLong)

    val dst = graft.SparkSpec.tmpDir("del-cmp-out")
    val compacted = IndexStore.compact(spark, dir, dst)

    val ref = IndexStore.buildAndSave(spark,
      all.join(victims.toDF("conv_id"), Seq("conv_id"), "left_anti"),
      graft.SparkSpec.tmpDir("del-cmp-ref"), BuildConfig(buckets = 4))

    assert(dictByTerm(compacted) == dictByTerm(ref))
    val sc = statsByConv(compacted); val sr = statsByConv(ref)
    assert(sc.keySet == sr.keySet && !victims.exists(sc.contains))
    sc.foreach { case (c, (mt, dl, n)) =>
      val (rmt, rdl, rn) = sr(c)
      assert(mt == rmt && dl == rdl && math.abs(n - rn) < 1e-12, s"stats $c")
    }
    val q = compacted.termDict.collect().map(_.term).sorted.take(3).mkString(" ")
    val qc = scoresByConv(compacted, q); val qr = scoresByConv(ref, q)
    assert(qc.keySet == qr.keySet)
    qc.foreach { case (c, s) => assert(math.abs(s - qr(c)) < 1e-12, s"score $c") }
    // meta reflects the physically compacted corpus
    assert(compacted.meta.docs == ref.meta.docs &&
      compacted.meta.postings == ref.meta.postings)
  }

  test("dedup -> delete -> search: the curation pipeline end-to-end") {
    import spark.implicits._
    // corpus with planted exact duplicates
    val uniq = (0 until 40).map(i => (f"c$i%03d", s"alpha bravo text$i charlie"))
    val dups = (0 until 10).map(i => (f"d$i%03d", s"alpha bravo text${i} charlie")) // dup of c0..c9
    val turns = (uniq ++ dups).map { case (c, t) =>
      Turn(c, 0, "user", t, null, new java.sql.Timestamp(0L))
    }.toDF()
    val dir = graft.SparkSpec.tmpDir("del-dedup")
    IndexStore.buildAndSave(spark, turns, dir, BuildConfig(buckets = 2))
    val view = IndexStore.load(spark, dir)

    // find exact duplicates over the assembled docs and keep the first
    val docs = IndexBuilder.assembleDocs(turns)
      .withColumnRenamed("conv_id", "doc_key")
    val losers = docs.groupBy("text")
      .agg(sort_array(collect_list("doc_key")).as("members"))
      .select(explode(expr("slice(members, 2, size(members))")).as("conv_id"))
    val nLosers = losers.count()
    assert(nLosers == 10L, s"planted 10 duplicates, found $nLosers")

    assert(IndexStore.delete(spark, losers, dir) == nLosers)
    val cleaned = IndexStore.load(spark, dir)
    val hits = new Searcher(cleaned).search(spark, "alpha bravo", 1000000, Or, Bm25)
      .collect().map(_.getString(1)).toSet
    assert(hits.nonEmpty && hits.forall(_.startsWith("c")), s"dup survived: $hits")
  }

  test("deleted conversation can be re-appended; snapshots stay consistent") {
    val dir = graft.SparkSpec.tmpDir("del-reapp")
    val all = Fixtures.synthTurns(spark, 60)
    IndexStore.buildAndSave(spark, all, dir, BuildConfig(buckets = 2))
    val conv = IndexStore.load(spark, dir).docMap
      .orderBy("conv_id").head().getString(1)
    val oldDocId = IndexStore.load(spark, dir).docMap
      .filter(col("conv_id") === conv).head().getLong(0)

    assert(IndexStore.delete(spark, Seq(conv), dir) == 1L) // event t1
    assert(IndexStore.load(spark, dir).docMap
      .filter(col("conv_id") === conv).count() == 0)

    // re-append the same conversation: fresh doc_id, old tombstone inert
    val again = IndexStore.append(spark, all.filter(col("conv_id") === conv), dir) // b2
    val row = again.docMap.filter(col("conv_id") === conv).collect()
    assert(row.length == 1 && row.head.getLong(0) > oldDocId,
      s"re-appended conv must get a fresh id (old $oldDocId, got ${row.toSeq})")
    // and it scores again
    val q = again.termDict.collect().map(_.term).sorted.take(3).mkString(" ")
    assert(new Searcher(again).search(spark, q, 1000000).count() > 0)

    // snapshot discipline across the shared event sequence:
    // asOf=0 (base): conv present with its ORIGINAL id
    val asBase = IndexStore.load(spark, dir, asOf = 0)
    assert(asBase.docMap.filter(col("conv_id") === conv).head().getLong(0) == oldDocId)
    // asOf=1 (tombstone event): conv absent
    assert(IndexStore.load(spark, dir, asOf = 1).docMap
      .filter(col("conv_id") === conv).count() == 0)
    // latest: fresh id only
    assert(IndexStore.load(spark, dir).docMap
      .filter(col("conv_id") === conv).head().getLong(0) > oldDocId)
  }
}
