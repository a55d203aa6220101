package graft.ir

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val sortedIdsGen: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 1L << 40))
      .map(_.distinct.sorted.toArray)

  test("varint+delta docId roundtrip (property)") {
    check(Prop.forAll(sortedIdsGen) { ids =>
      Codec.decodeDocIds(Codec.encodeDocIds(ids), ids.length).toSeq == ids.toSeq
    })
  }

  test("tf roundtrip (property)") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(1, 1 << 20))) { tfs =>
      val a = tfs.toArray
      Codec.decodeTfs(Codec.encodeTfs(a), a.length).toSeq == a.toSeq
    })
  }

  test("block build: contents, skip metadata, block-max bounds (property)") {
    // (docId, tf, ntf, docLen) — doc-local quantities only (Schemas.Block)
    val entriesGen = sortedIdsGen.map { ids =>
      ids.map(d => (d, 1 + (d % 7).toInt, (d % 100) / 100.0, 1L + (d % 31)))
    }
    check(Prop.forAll(entriesGen) { entries =>
      val blocks = Codec.buildBlocks(7L, entries)
      val decoded = blocks.flatMap(Codec.decodeBlock)
      val contentOk = decoded == entries.map(e => (e._1, e._2)).toSeq
      val blockOk = blocks.forall { b =>
        val ids = Codec.decodeDocIds(b.doc_ids, b.count)
        b.count <= Codec.BlockSize && b.count > 0 &&
          ids.head == b.first_doc_id && ids.last == b.last_doc_id
      }
      val orderedOk = blocks.sliding(2).forall {
        case Seq(a, b) => a.last_doc_id < b.first_doc_id
        case _ => true
      }
      val maxOk = blocks.zipWithIndex.forall { case (b, bi) =>
        val slice = entries.slice(bi * Codec.BlockSize, bi * Codec.BlockSize + b.count)
        slice.forall(e => e._3 <= b.block_max_ntf && e._4 >= b.min_dl &&
          e._2 <= b.max_tf)
      }
      contentOk && blockOk && orderedOk && maxOk
    })
  }

  test("compression is effective on dense ids") {
    val ids = (1000L until 11000L).toArray
    val bytes = Codec.encodeDocIds(ids)
    assert(bytes.length < ids.length * 2) // ~1 byte/delta vs 8 raw
  }
}
