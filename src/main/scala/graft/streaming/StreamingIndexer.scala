package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.ir._

/** Accumulated turns of a not-yet-closed conversation. */
final case class ConvBuffer(turns: Seq[Turn])

/**
 * Structured Streaming ingest: turn streams → incremental index appends.
 *
 * The reference has no streaming path (its index is rebuilt on demand via
 * the `I_F` request, IRWorker.java:54-57); this is an engine extension
 * (SURVEY.md §2.8) built from the two batch primitives that already exist —
 * the append contract freezes a conversation once indexed, so the streaming
 * layer's job is exactly one thing: decide when a conversation is COMPLETE.
 *
 * Sessionization: a conversation is closed once no new turn arrives within
 * `gapMs` of its latest event time, tracked with a watermark + per-key
 * event-time timeout (`flatMapGroupsWithState` — typed state, Append mode,
 * emits each conversation's full turn set exactly once). Closed
 * conversations flow through `foreachBatch` into `IndexStore.appendOrCreate`:
 * first batch builds the base index, every later batch is a delta append.
 * Crash safety is layered: the sink checkpoint replays an unacknowledged
 * micro-batch, the append manifest resumes a half-written batch, and the
 * conv-level anti-join makes re-delivered conversations no-ops.
 *
 * Scale posture: state is one buffer per OPEN conversation (bounded by the
 * gap and arrival rate, not corpus size); each micro-batch tokenizes and
 * shuffles only its own closed conversations; the growing index is never
 * rewritten (corpus-stat-free block metadata, Schemas.Block). Turns arriving
 * after their conversation closed (> gap late) are dropped by the watermark
 * or the append anti-join — pick `gapMs` above the maximum intra-conversation
 * silence you need to honor.
 */
object StreamingIndexer {

  /** Emit the full turn set of each conversation once it has been idle for
    * `gapMs` of event time. Requires `turns` to be a streaming Dataset. */
  def closedConversations(turns: Dataset[Turn], gapMs: Long): Dataset[Turn] = {
    import turns.sparkSession.implicits._
    turns
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvBuffer, Turn](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, in: Iterator[Turn], state: GroupState[ConvBuffer]) =>
          if (state.hasTimedOut) {
            val closed = state.get.turns
            state.remove()
            closed.iterator
          } else {
            val buf = state.getOption.map(_.turns).getOrElse(Seq.empty) ++ in
            state.update(ConvBuffer(buf))
            val lastTs = buf.iterator.map(_.ts.getTime).max
            // timeout must sit above the current watermark; a conversation
            // whose deadline already passed closes at the next trigger
            state.setTimeoutTimestamp(
              math.max(lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Start a streaming query that maintains the index at `dir`: sessionize,
    * then append each micro-batch of closed conversations. */
  def indexStream(
      turns: Dataset[Turn],
      dir: String,
      gapMs: Long,
      checkpoint: String,
      cfg: BuildConfig = BuildConfig()): StreamingQuery =
    closedConversations(turns, gapMs)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Turn], _: Long) =>
        if (!batch.isEmpty)
          IndexStore.appendOrCreate(batch.sparkSession, batch.toDF(), dir, cfg)
        ()
      }
      .start()
}
