package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import scala.jdk.CollectionConverters._

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
    * then append closed conversations.
    *
    * `coalesceTurns` (r3 verdict #8): a staged append pays ~10 s of fixed
    * stage cost per micro-batch regardless of delta size, so appending every
    * trigger caps streaming throughput at (batch size / fixed cost). With
    * `coalesceTurns > 0`, each micro-batch instead SPILLS its closed
    * conversations as one cheap parquet write under `dir/_stream_stage/`,
    * and the full append machinery runs only once the spilled backlog
    * reaches the threshold — the fixed cost amortizes across many triggers
    * while closed conversations remain durable the moment their trigger
    * commits. Crash safety: spill files are named by epoch (a replayed
    * micro-batch overwrites its own file), a `_pending.tsv` marker pins the
    * exact file set of an in-flight flush (so a crashed flush resumes with
    * its original input signature), and the conv-level anti-join makes any
    * double-delivery a no-op. Call [[flushStaged]] after stopping the query
    * (or at startup) to fold in the remainder. `coalesceTurns = 0` keeps the
    * append-every-batch behavior. */
  def indexStream(
      turns: Dataset[Turn],
      dir: String,
      gapMs: Long,
      checkpoint: String,
      cfg: BuildConfig = BuildConfig(),
      coalesceTurns: Long = 0L): StreamingQuery =
    closedConversations(turns, gapMs)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Turn], epoch: Long) =>
        if (coalesceTurns <= 0L) {
          if (!batch.isEmpty)
            IndexStore.appendOrCreate(batch.sparkSession, batch.toDF(), dir, cfg)
        } else {
          val n = batch.count()
          if (n > 0) batch.toDF().write.mode("overwrite")
            .parquet(s"${stageDir(dir)}/e$epoch-$n.parquet")
          if (stagedFiles(dir).map(_._2).sum >= coalesceTurns) {
            flushStaged(batch.sparkSession, dir, cfg)
            ()
          }
        }
        ()
      }
      .start()

  private def stageDir(dir: String): String = s"$dir/_stream_stage"
  private def pendingMarker(dir: String): Path = Paths.get(stageDir(dir), "_pending.tsv")

  /** Spilled (path, turn count) pairs — the count rides in the file name so
    * backlog size needs no footer reads. */
  private def stagedFiles(dir: String): Seq[(String, Long)] = {
    val d = Paths.get(stageDir(dir))
    if (!Files.exists(d)) Seq.empty
    else {
      val listing = Files.list(d)
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case name @ StagedName(_, n) => (s"${stageDir(dir)}/$name", n.toLong) }
        .toSeq.sortBy(_._1)
      finally listing.close()
    }
  }
  private val StagedName = """^(e\d+)-(\d+)\.parquet$""".r

  /**
   * Fold all spilled micro-batches into the index with ONE append. Two-phase
   * for crash consistency: the marker written first pins the input file set,
   * so a flush killed mid-append re-runs with the identical input (the
   * append manifest's begin-signature check demands exactly that), and a
   * flush killed after the append but before cleanup re-appends a fully
   * known conv set — a no-op by the anti-join. Returns turns folded in.
   */
  def flushStaged(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      cfg: BuildConfig = BuildConfig()): Long = {
    // resume an interrupted flush first, with its pinned input set
    if (Files.exists(pendingMarker(dir))) {
      val pinned = Files.readAllLines(pendingMarker(dir)).asScala
        .filter(_.nonEmpty).filter(p => Files.exists(Paths.get(p))).toSeq
      if (pinned.nonEmpty) {
        IndexStore.appendOrCreate(spark,
          pinned.map(spark.read.parquet(_)).reduce(_ unionByName _), dir, cfg)
        pinned.foreach(p => rmTree(Paths.get(p)))
      }
      Files.delete(pendingMarker(dir))
    }
    val staged = stagedFiles(dir)
    if (staged.isEmpty) return 0L
    Files.createDirectories(Paths.get(stageDir(dir)))
    Files.write(pendingMarker(dir),
      staged.map(_._1).mkString("", "\n", "\n").getBytes("UTF-8"))
    IndexStore.appendOrCreate(spark,
      staged.map(s => spark.read.parquet(s._1)).reduce(_ unionByName _), dir, cfg)
    staged.foreach(s => rmTree(Paths.get(s._1)))
    Files.delete(pendingMarker(dir))
    staged.map(_._2).sum
  }

  private def rmTree(p: Path): Unit = {
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach((q: Path) => { Files.delete(q); () })
      finally walk.close()
    }
  }
}
