package graft

import graft.SparkSpec

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * queries entry must have either an oracle or a documented rows-only role. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracle sql: ${o -- q}")
  }

  test("all queries run and are non-empty at sf0.001 (except threshold ops)") {
    // threshold/pair ops may be legitimately empty on the tiny corpus
    val mayBeEmpty = Set("dd_ngram_jaccard", "dd_minhash_lsh", "dd_simhash",
      "dd_embedding", "j4_and_docs")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name empty")
    }
  }
}
