package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream
  * (TESTDATA.md `events`: event_id, ts, user_id, event_type, value,
  * props).
  *
  * The reference is strictly batch (SURVEY.md §2.10) — these are the
  * engine's forward-looking stream surface: the same transforms run on
  * `readStream` inputs with watermarked state, so ingest-time mention
  * extraction / quality filtering can run continuously at scale. All
  * operators are tested with MemoryStream (StreamingSpec) and produce
  * byte-identical results to their batch twins.
  */
object StreamOps {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserSession(
      user_id: Long, n_events: Long, start_ts: Long, last_ts: Long)

  /** Watermarked sliding-window counts per event type: the canonical
    * streaming aggregation (late data beyond 10 min dropped; state
    * bounded by watermark — safe at any stream rate). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessionization with explicit state
    * (mapGroupsWithState + processing-time timeout): the streaming
    * twin of the batch lag-window sessionizer (Queries q09). Emits the
    * running session per user on every trigger. */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800)
      : Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event],
         state: GroupState[UserSession]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption.getOrElse(
            UserSession(userId, 0L, Long.MaxValue, Long.MinValue))
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            cur =
              if (cur.n_events == 0 || t - cur.last_ts > gapSec)
                UserSession(userId, 1L, t, t) // new session
              else cur.copy(n_events = cur.n_events + 1, last_ts = t)
          }
          state.update(cur)
          cur
        })
  }

  /** Streaming dedup: drop events already seen (by event_id) within
    * the watermark horizon — the streaming face of the exact-dedup
    * operator. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming mention detection: the fused segment→featurize→Viterbi→
    * extract kernel is stateless per file, so it lifts onto a
    * `readStream` source unchanged — ingest-time entity extraction
    * with no state store and no watermark needed (north-star ingest
    * path; batch remains the contract). */
  def streamingMentions(files: org.apache.spark.sql.Dataset[graft.core.SourceFile])
      : org.apache.spark.sql.Dataset[graft.core.Mention] =
    graft.pipeline.Pipeline.mentions(files)

  /** Language-routed streaming decode: the per-language fused kernel
    * ([[graft.pipeline.Pipeline.mentions]](files, lang) — per-language
    * features + gaz + fitted model, broadcast) is equally stateless
    * and narrow, so any of the six languages tags an unbounded stream
    * unchanged. */
  def streamingMentions(
      files: org.apache.spark.sql.Dataset[graft.core.SourceFile],
      lang: String)
      : org.apache.spark.sql.Dataset[graft.core.Mention] =
    graft.pipeline.Pipeline.mentions(files, lang)

  /** Streaming decode under ANY fitted model artifact
    * ([[graft.io.ModelIO.loadFitted]] → here): the FittedModel serve
    * kernel is the same stateless narrow mapPartitions as the default
    * path, so a trained/fitted model tags an unbounded stream
    * unchanged — load once, broadcast, `readStream` through. */
  def streamingFittedMentions(
      files: org.apache.spark.sql.Dataset[graft.core.SourceFile],
      model: graft.crf.FitCrf.FittedModel)
      : org.apache.spark.sql.Dataset[graft.core.Mention] = {
    import files.sparkSession.implicits._
    graft.crf.FitCrf
      .tag(graft.segment.Segmenter.sentences(files), model)
      .flatMap(graft.spans.Spans.extract _)
  }

  /** Streaming entity linking: like the decode kernel, the linker is a
    * stateless narrow map over a broadcast dictionary, so the whole
    * ingest-time path corpus → mentions → linked mentions runs under
    * Structured Streaming with no state store. Canonicalization stays
    * batch (iterative global joins — SURVEY §2.10's batch contract). */
  def streamingLinkedMentions(files: org.apache.spark.sql.Dataset[graft.core.SourceFile])
      : org.apache.spark.sql.Dataset[graft.link.Linker.LinkedMention] =
    graft.link.Linker.link(streamingMentions(files))

  /** Batch twin of [[windowedCounts]] for parity tests: identical
    * logical transform applied to a bounded DataFrame. */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
}
