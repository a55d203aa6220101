package graft.ir

import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle itself against the hand-checked tp2 facts (FIXTURES.md §2)
  * so the oracle-vs-Spark comparisons rest on verified ground truth. */
class OracleSpec extends AnyFunSuite {

  private val idx = Oracle.index(Fixtures.tp2Corpus)

  test("tp2 hand-checked dictionary facts") {
    assert(idx.nDocs == 4)
    assert(idx.df("software") == 3 && idx.cf("software") == 5)
    assert(idx.df("libre") == 3 && idx.cf("libre") == 4)
    assert(idx.df("pais") == 3)
    assert(idx.df("fundamental") == 3)
    assert(idx.maxTf == Vector(2, 1, 2, 2))
    assert(idx.idf("pais") == math.log10(4.0 / 3.0))
  }

  test("postings are docId-ascending with correct tfs") {
    assert(idx.postings("software") == Vector((0L, 2), (2L, 1), (3L, 2)))
    assert(idx.postings("libre") == Vector((0L, 1), (1L, 1), (3L, 2)))
  }

  test("cosine: single-term query ranks by (tf/maxtf), ties by docId") {
    val r = idx.evaluateCosine("tecnologia")
    // only doc2 contains tecnologia
    assert(r.map(_._1) == Seq(2L))
  }

  test("cosine: 'pais libre' returns all docs holding either term, desc") {
    val r = idx.evaluateCosine("pais libre")
    assert(r.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    assert(r == r.sortBy { case (d, s) => (-s, d) })
    // doc3 (c0004, both terms, libre at max tf) edges doc1 (c0002):
    // 0.2572 vs 0.2538 by the §1.4 formulas (hand-computed)
    assert(r.head._1 == 3L && r(1)._1 == 1L)
    assert(math.abs(r.head._2 - 0.2572) < 5e-4)
  }

  test("AND mode intersects") {
    val or = idx.evaluateCosine("pais libre", Or).map(_._1).toSet
    val and = idx.evaluateCosine("pais libre", And).map(_._1).toSet
    assert(and.subsetOf(or))
    assert(and == Set(1L, 3L)) // docs containing both pais and libre
  }

  test("OOV terms dropped; fully-OOV query empty") {
    assert(idx.evaluateCosine("primera consulta").isEmpty)
    val r = idx.evaluateCosine("perro libre finanzas religion estado morfologia")
    assert(r.nonEmpty) // libre/estado survive
  }

  test("bm25 basic sanity") {
    val r = idx.evaluateBm25("pais libre")
    assert(r.nonEmpty && r == r.sortBy { case (d, s) => (-s, d) })
  }
}
