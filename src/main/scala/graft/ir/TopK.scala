package graft.ir

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One retained hit of a bounded per-group top-k. */
final case class TopKHit(doc_id: Long, conv_id: String, score: Double)

/**
 * Bounded per-group top-k aggregate (score desc, doc_id asc) — the batch-
 * serving replacement for `row_number() OVER (PARTITION BY query_id ...)`
 * (r3 verdict #5): the window form shuffles EVERY scored (query, doc) row
 * and sorts each query's full match list; this aggregate keeps at most k
 * rows per group per task (partial aggregation), so the exchange carries
 * ≤ k·tasks rows per query and nothing is ever globally sorted. Memory is
 * O(k) per group — the property a 10^9-match relevance sweep needs.
 *
 * Determinism: the retained set and its order are defined purely by
 * (score desc, doc_id asc), a total order over distinct docs, so any
 * arrival/merge order yields the same result.
 */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, String, Double), Seq[TopKHit], Seq[TopKHit]] {

  private def better(a: TopKHit, b: TopKHit): Boolean =
    a.score > b.score || (a.score == b.score && a.doc_id < b.doc_id)

  override def zero: Seq[TopKHit] = Seq.empty

  override def reduce(buf: Seq[TopKHit], in: (Long, String, Double)): Seq[TopKHit] = {
    val h = TopKHit(in._1, in._2, in._3)
    if (buf.length >= k && better(buf.last, h)) buf // common path: O(1) reject
    else ((buf :+ h).sortWith(better)).take(k)
  }

  override def merge(a: Seq[TopKHit], b: Seq[TopKHit]): Seq[TopKHit] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[TopKHit]): Seq[TopKHit] = r

  override def bufferEncoder: Encoder[Seq[TopKHit]] = ExpressionEncoder[Seq[TopKHit]]()
  override def outputEncoder: Encoder[Seq[TopKHit]] = ExpressionEncoder[Seq[TopKHit]]()
}

object TopKAggregator {
  /** Encoder for the (doc_id, conv_id, score) input tuple of the udaf. */
  val inputEncoder: Encoder[(Long, String, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaDouble)
}
