package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** A timestamped pipeline event (a doc/triple arrival) for the streaming
  * operators below. `key` is the grouping dimension (source feed, bucket,
  * predicate — caller's choice).
  */
case class StampedEvent(key: String, ts: Timestamp)

/** One closed session of consecutive events for a key (gap-based). */
case class EventSession(key: String, start: Timestamp, end: Timestamp, n: Long)

/** Structured-Streaming operators over the pipeline's event streams —
  * the streaming surface beyond IncrementalKg's foreachBatch batch-reuse:
  * event-time windowed aggregation under a watermark, and custom session
  * state via flatMapGroupsWithState.
  *
  * The reference itself has no event time (pull generators,
  * exec/infer.py:37-51); these exist for the 100 TB ingest side, where doc
  * arrival time drives freshness metrics and late data is real. State
  * stores shard by key hash — no driver state, arbitrarily many keys.
  */
object StreamOps {

  /** Tumbling-window event counts per key under an event-time watermark.
    * Late events (older than the watermark delay) are dropped by Spark's
    * state store instead of growing state forever — the property that
    * keeps this runnable on an unbounded 100 TB/day feed.
    *
    * Works on a streaming OR batch DataFrame with (key, ts) columns.
    */
  def windowedCounts(events: DataFrame, windowLen: String,
                     watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("key"), col("n"))

  /** Stream-static enrichment: join a streaming feed against a STATIC
    * dimension table (e.g. the alias -> canonical-entity dictionary).
    * Stateless — Spark re-PLANS (and for a file source re-reads the
    * already-resolved files of) the static side per micro-batch. Note
    * this is NOT a dictionary refresh: a file-based `dim` resolves its
    * file listing (InMemoryFileIndex) once at DataFrame creation, so
    * parquet files added or replaced under the same path after the query
    * starts are generally not seen (a replaced file can even fail the
    * batch with FileNotFoundException). To pick up new dictionary
    * snapshots without a restart, re-read the dim inside `foreachBatch`
    * (see [[enrichRefreshing]]). The broadcast hint keeps the per-batch
    * plan a BroadcastHashJoin (dictionary-scale side never shuffles the
    * stream). Left join: unmatched stream rows pass through with nulls,
    * nothing is silently dropped.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** [[enrich]] with per-batch dictionary refresh: `loadDim` is invoked
    * inside every `foreachBatch` tick, so a new dimension snapshot
    * (e.g. a fresh parquet dir, or the latest manifest read of a
    * KgJob table) is resolved from scratch each micro-batch — the
    * refresh behavior `enrich`'s static plan cannot give. The per-batch
    * cost is one metadata-scale re-resolution + broadcast of a
    * dictionary-sized table; `emit` receives the enriched batch
    * (exactly-once if `emit` writes idempotently by `batchId`).
    */
  def enrichRefreshing(stream: DataFrame, loadDim: () => DataFrame,
                       key: String, checkpointDir: String)(
      emit: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batch.join(broadcast(loadDim()), Seq(key), "left"), batchId)
      }
      .start()

  /** Cross-batch exact dedup on a document stream: the FIRST doc with a
    * given content hash passes, later copies are dropped — including
    * copies arriving in later micro-batches, which a per-batch
    * `dropDuplicates` would re-admit. Built on
    * `dropDuplicatesWithinWatermark`, so the seen-hash state store is
    * evicted once the event-time watermark passes a hash's horizon:
    * state stays bounded by the dedup window, not the stream's lifetime —
    * the property an unbounded 100 TB/day ingest feed needs. Duplicates
    * separated by more than the watermark delay are treated as fresh
    * (the standard streaming-dedup horizon trade-off; corpus-wide exact
    * dedup remains the batch op [[graft.ops.Dedup.exact]]).
    *
    * Input must carry (text, ts); any other columns pass through.
    */
  def streamingDedup(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Gap-based sessionization via flatMapGroupsWithState: a session for a
    * key closes once the event-time watermark passes (last event + gap).
    * Uses EventTimeTimeout so state is evicted by watermark progress, not
    * wall clock — deterministic under replay. Append mode: sessions are
    * emitted exactly once, when closed.
    */
  def sessionize(events: Dataset[StampedEvent], gapMs: Long,
                 watermarkDelay: String): Dataset[EventSession] = {
    implicit val sessEnc = Encoders.product[EventSession]
    implicit val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val strEnc = Encoders.STRING
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long, Long), EventSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[StampedEvent],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: close and emit the session
            val (start, last, n) = state.get
            state.remove()
            Iterator.single(EventSession(key, new Timestamp(start), new Timestamp(last), n))
          } else {
            // merge the micro-batch's events into the open session. Events
            // within one group iterator are not ordered by time; fold
            // min/max/count. A gap WITHIN a batch still splits correctly
            // only at watermark timeouts — acceptable for coarse gaps
            // (sessions are closed by event-time progress, not batch
            // boundaries).
            var start = Long.MaxValue; var last = Long.MinValue; var n = 0L
            if (state.exists) { val s = state.get; start = s._1; last = s._2; n = s._3 }
            it.foreach { e =>
              val t = e.ts.getTime
              if (t < start) start = t
              if (t > last) last = t
              n += 1
            }
            state.update((start, last, n))
            state.setTimeoutTimestamp(last + gapMs)
            Iterator.empty
          }
      }
  }
}
