package graft.streaming

import graft.extract.Extractor
import graft.schema.{ExtractedTurn, Turn}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Structured Streaming variant of the extraction pipeline: the same
  * pure per-turn extractor over a micro-batched source, with
  * exactly-once file sink + checkpointing (the streaming face of the
  * Checkpoint/manifest resume contract).
  *
  * Design notes:
  *  - Extraction is stateless per row, so the stream needs no
  *    watermarks or state store; dedupe across batches (duplicate
  *    (conv_id, turn_idx) arriving in different micro-batches) is the
  *    one stateful concern — provided by `withDedupe` via
  *    dropDuplicates + watermark, bounded state.
  *  - The reference's closest analogue is its pull-based backpressured
  *    generator (vkit/utility/pool.py:136-150); rate control maps to
  *    `maxFilesPerTrigger` / trigger intervals.
  */
object StreamingJob {

  /** Transform a streaming Dataset[Turn] into extracted turns. */
  def extractStream(turns: Dataset[Turn]): Dataset[ExtractedTurn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions { it =>
      it.map { t =>
        val ex = Extractor.extract(t)
        ExtractedTurn(t.conv_id, t.turn_idx, t.role, t.tool, ex.extractor,
          ex.extracted_text, ex.spans, ex.spans.length, ex.error,
          ex.extractor_version)
      }
    }
  }

  /** Cross-batch dedupe on (conv_id, turn_idx) with a bounded state
    * window. dropDuplicatesWithinWatermark ties the dedupe state's
    * lifetime to the event-time watermark even though the key set has
    * no event-time column — plain dropDuplicates(conv_id, turn_idx)
    * would never expire its state and grow unboundedly in a
    * long-running stream.
    */
  def withDedupe(turns: Dataset[Turn],
      watermarkDelay: String = "1 hour"): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
      .as[Turn]
  }

  /** Watermarked windowed aggregation over the extracted stream:
    * per conversation per event-time window, turn counts / span totals /
    * error counts — the monitoring rollup a production run feeds to its
    * metrics table. Late data beyond the watermark is dropped (bounded
    * state).
    */
  case class TurnStat(conv_id: String, ts: java.sql.Timestamp,
      n_spans: Int, is_error: Int)

  def windowedStats(turns: Dataset[Turn],
      windowLen: String = "10 minutes",
      watermarkDelay: String = "30 minutes")
      : org.apache.spark.sql.DataFrame = {
    val spark = turns.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    turns.mapPartitions { it =>
      it.map { t =>
        val ex = Extractor.extract(t)
        TurnStat(t.conv_id, t.ts, ex.spans.length,
          if (ex.error.nonEmpty) 1 else 0)
      }
    }
      .withWatermark("ts", watermarkDelay)
      .groupBy(org.apache.spark.sql.functions.window($"ts", windowLen),
        $"conv_id")
      .agg(count(lit(1)).as("n_turns"), sum($"n_spans").as("n_spans"),
        sum($"is_error").as("n_errors"))
  }

  /** Custom-state streaming (flatMapGroupsWithState): per-user
    * sessionization of an event stream with an explicit state machine —
    * the operator family for semantics the built-in windowed/dedupe
    * state cannot express. State per user: (event count, session
    * count, last event second); a new session opens when the event-time
    * gap exceeds `gapSec` (the same rule as the batch q_sessionize
    * query, whose oracle the streaming output must reproduce).
    * Summaries are emitted via EVENT-TIME TIMEOUT: each update arms the
    * group's timeout just past its last event, so the group emits once
    * the watermark passes it — bounded state, deterministic final
    * output under AvailableNow (a sentinel row advances the final
    * watermark, the no-data batch fires the timeouts).
    *
    * Batch-equivalence contract: rows must arrive in event-time order
    * ACROSS micro-batches (within a batch they are sorted here); the
    * staged single-batch replay guarantees it, and a production stream
    * holds it to within the watermark delay by construction of the
    * upstream log. Seconds use floor(millis/1000) — the same value
    * unix_timestamp() yields in the batch query.
    */
  case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double, props: String)

  case class SessionSummary(user_id: Long, n_sessions: Long,
      n_events: Long)

  case class SessionState(nEvents: Long, nSessions: Long, lastSec: Long)

  def sessionize(events: Dataset[EventRow], gapSec: Long = 1800,
      watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[EventRow],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(user, s.nSessions, s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption
              .getOrElse(SessionState(0L, 0L, Long.MinValue))
            for (e <- sorted) {
              val sec = Math.floorDiv(e.ts.getTime, 1000L)
              val newSession = s.nEvents == 0L || sec - s.lastSec > gapSec
              s = SessionState(s.nEvents + 1,
                s.nSessions + (if (newSession) 1L else 0L), sec)
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastSec * 1000L + 1000L)
            Iterator.empty
          }
      }
  }

  /** Stream-stream inner join with an event-time interval constraint:
    * each purchase matched to the same user's views in the preceding
    * `windowSec` seconds (the attribution join a production event
    * pipeline runs continuously). BOTH sides are watermarked and the
    * join condition carries the time range — that pair is what lets
    * the state store evict buffered rows once the watermark passes
    * them, keeping join state bounded by (rate x window) instead of
    * growing with the whole stream. Inner-join matches emit as soon
    * as both sides arrive (no finalization wait), so the output under
    * AvailableNow equals the batch interval join.
    */
  def intervalJoin(purchases: Dataset[EventRow],
      views: Dataset[EventRow], windowSec: Long = 21600,
      watermarkDelay: String = "10 minutes")
      : org.apache.spark.sql.DataFrame = {
    val spark = purchases.sparkSession
    import spark.implicits._
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts".as("p_ts"))
    val v = views.withWatermark("ts", watermarkDelay)
      .select($"event_id".as("view_id"), $"user_id".as("v_user"),
        $"ts".as("v_ts"))
    p.join(v,
      $"p_user" === $"v_user" &&
        $"v_ts" >= $"p_ts" -
          org.apache.spark.sql.functions.expr(
            s"INTERVAL $windowSec SECONDS") &&
        $"v_ts" <= $"p_ts")
      .select($"purchase_id", $"view_id", $"p_user".as("user_id"))
  }

  /** Read a parquet directory as a stream of turns. */
  def readTurnStream(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Int = 8): Dataset[Turn] = {
    import spark.implicits._
    spark.readStream
      .schema(spark.createDataset(Seq.empty[Turn]).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .as[Turn]
  }

  /** Full streaming pipeline writer: parquet sink + checkpoint. Caller
    * starts/awaits the query.
    */
  def writer(out: Dataset[ExtractedTurn], outputDir: String,
      checkpointDir: String): DataStreamWriter[ExtractedTurn] =
    out.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())

  /** Streaming media source: binary media rows arriving as parquet
    * files — the continuous-crawl shape of the multimodal arm.
    */
  def readMediaStream(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Int = 8)
      : Dataset[graft.ops.Multimodal.MediaRow] = {
    import spark.implicits._
    spark.readStream
      .schema(spark.createDataset(
        Seq.empty[graft.ops.Multimodal.MediaRow]).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .as[graft.ops.Multimodal.MediaRow]
  }

  /** Exactly-once parquet sink for any stateless streaming transform
    * (the `writer` shape, generic element type).
    */
  def sink[T](out: Dataset[T], outputDir: String,
      checkpointDir: String): DataStreamWriter[T] =
    out.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
}
