package graft.ir

import scala.collection.mutable.ArrayBuffer

/**
 * Delta + varint posting-block codec (pure, no Spark deps — unit-testable
 * and usable inside Aggregators/flatMaps on executors).
 *
 * Replaces the reference's fixed-width little-endian uint32 posting files
 * (`/root/reference/IR_server/IR_python/modulos/Postings.py:212-234`) with
 * compressed blocks: docIds are strictly ascending within a posting list
 * (reference guarantee re-established at
 * `IR_server/java_src/Controller/GpuServerHandler.java:244-263`), so we store
 * first docId + varint deltas. Block granularity (~BlockSize entries) plays
 * the role of the reference's sqrt(df) skip pointers
 * (`modulos/Postings.py:327-352`): first/last docId per block gives the same
 * leapfrog capability at block granularity, plus block-max scorer bounds for
 * WAND pruning which the reference lacks.
 */
object Codec extends Serializable {

  val BlockSize: Int = 128

  /** Unsigned LEB128 append. */
  private def putVarLong(buf: ArrayBuffer[Byte], value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      buf += ((v & 0x7F) | 0x80).toByte
      v >>>= 7
    }
    buf += (v & 0x7F).toByte
  }

  /** Encode strictly-ascending docIds as first-value + deltas, varint. */
  def encodeDocIds(docIds: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](docIds.length * 2)
    var prev = 0L
    var i = 0
    while (i < docIds.length) {
      val d = if (i == 0) docIds(0) else docIds(i) - prev - 1
      require(i == 0 || docIds(i) > prev, s"docIds not strictly ascending at $i")
      putVarLong(buf, d)
      prev = docIds(i)
      i += 1
    }
    buf.toArray
  }

  def encodeTfs(tfs: Array[Int]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](tfs.length)
    var i = 0
    while (i < tfs.length) {
      require(tfs(i) > 0, "tf must be positive")
      putVarLong(buf, tfs(i).toLong)
      i += 1
    }
    buf.toArray
  }

  private def getVarLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    var b = 0
    do {
      b = bytes(p) & 0xFF
      v |= (b & 0x7FL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  def decodeDocIds(bytes: Array[Byte], count: Int): Array[Long] = {
    val out = new Array[Long](count)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < count) {
      val (v, np) = getVarLong(bytes, pos)
      out(i) = if (i == 0) v else prev + v + 1
      prev = out(i)
      pos = np
      i += 1
    }
    out
  }

  def decodeTfs(bytes: Array[Byte], count: Int): Array[Int] = {
    val out = new Array[Int](count)
    var pos = 0
    var i = 0
    while (i < count) {
      val (v, np) = getVarLong(bytes, pos)
      out(i) = v.toInt
      pos = np
      i += 1
    }
    out
  }

  /**
   * Chop one docId-sorted posting slice into compressed blocks.
   *
   * @param entries (docId, tf, ntf, docLen) sorted by docId, strictly
   *                ascending docIds; ntf = tf/maxtf(doc). Only doc-local
   *                quantities enter block metadata (never idf/avgdl/N), so
   *                blocks stay valid when the corpus grows — see the Block
   *                scaladoc for how query-time scorer bounds are assembled.
   */
  def buildBlocks(termId: Long, entries: Array[(Long, Int, Double, Long)]): Seq[Block] = {
    val out = new ArrayBuffer[Block](entries.length / BlockSize + 1)
    var start = 0
    while (start < entries.length) {
      val end = math.min(start + BlockSize, entries.length)
      val n = end - start
      val docIds = new Array[Long](n)
      val tfs = new Array[Int](n)
      var maxTf = 0
      var maxNtf = 0.0
      var minDl = Long.MaxValue
      var i = 0
      while (i < n) {
        val (d, tf, ntf, dl) = entries(start + i)
        docIds(i) = d; tfs(i) = tf
        if (tf > maxTf) maxTf = tf
        if (ntf > maxNtf) maxNtf = ntf
        if (dl < minDl) minDl = dl
        i += 1
      }
      out += Block(termId, docIds(0), docIds(n - 1), n,
        encodeDocIds(docIds), encodeTfs(tfs), maxTf, maxNtf, minDl)
      start = end
    }
    out.toSeq
  }

  /** Decode one block back to (docId, tf) pairs. */
  def decodeBlock(b: Block): Array[(Long, Int)] = {
    val ids = decodeDocIds(b.doc_ids, b.count)
    val tfs = decodeTfs(b.tfs, b.count)
    ids.zip(tfs)
  }
}
