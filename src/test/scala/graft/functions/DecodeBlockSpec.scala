package graft.functions

import graft.SparkSpec
import graft.ir.{Block, Codec}
import org.apache.spark.sql.functions.col

/** The native generator must decode exactly what the codec round-trips. */
class DecodeBlockSpec extends SparkSpec {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("DecodeBlock generator == Codec.decodeBlock on random blocks") {
    import spark.implicits._
    // random strictly-ascending docId runs with random tfs, multiple blocks
    val blocks: Seq[Block] = (0 until 20).flatMap { t =>
      val n = 1 + (mix(t) & 0x3FF).toInt // up to ~1k entries → several blocks
      var d = (mix(t * 7) & 0xFFFF)
      val entries = (0 until n).map { i =>
        d += 1 + (mix(t * 131 + i) & 0x3F)
        (d, 1 + (mix(d) & 0xFF).toInt, 0.5, 100L)
      }.toArray
      Codec.buildBlocks(t.toLong, entries)
    }
    val df = blocks.toDS().toDF()
    val got = DecodeBlock.postings(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val want = blocks.flatMap(b =>
      Codec.decodeBlock(b).map { case (d, tf) => (b.term_id, d, tf) }).sorted
    assert(got == want)
    assert(got.nonEmpty && got.size > 1000)
    // schema + column naming contract used by every decode consumer
    assert(DecodeBlock.postings(df).columns.toSeq == Seq("term_id", "doc_id", "tf"))
    // survives filters/projections around it (the serving shape)
    val filtered = DecodeBlock.postings(df.filter(col("term_id") === 3L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(filtered == want.filter(_._1 == 3L))
  }
}
