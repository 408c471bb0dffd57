package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time analytics over the transcript stream — the §2.12 Structured
  * Streaming surface beyond ingest: watermarked windowed aggregation and
  * custom-state sessionization via `flatMapGroupsWithState`.
  *
  * The reference processes uploads on a 60-minute cron with no notion of
  * event time; these operators are the Spark-native upgrade for monitoring
  * live transcript traffic (turn rates, conversation session boundaries) at
  * ingest scale: state is partitioned by conv_id, so it shards across
  * executors, and watermarks bound it — no unbounded driver-side state.
  */
object SessionStats {

  final case class SessionSummary(
      conv_id: String, n_turns: Long,
      start_ts: Timestamp, end_ts: Timestamp,
      closed_by: String)

  final case class SessionState(nTurns: Long, startMs: Long, lastMs: Long)

  /** Tumbling-window turn counts per conversation with a watermark: late
    * events beyond `watermark` are dropped and window state is evicted —
    * the canonical bounded-state streaming aggregate.
    */
  def windowedTurnCounts(turns: DataFrame,
                         windowDur: String = "1 minute",
                         watermark: String = "2 minutes"): DataFrame =
    turns.withWatermark("ts", watermark)
      .groupBy(col("conv_id"), window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("conv_id"),
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("n_turns"))

  /** Gap-based sessionization with explicit per-conversation state: a
    * session CLOSES when a later event arrives more than `gapMs` after the
    * previous one ("gap"), or when the watermark passes lastSeen + gapMs
    * with no successor ("timeout", via EventTimeTimeout). Emits one summary
    * row per closed session (append mode).
    */
  def sessionize(spark: SparkSession, turns: DataFrame,
                 gapMs: Long = 5L * 60 * 1000,
                 watermark: String = "10 seconds"): Dataset[SessionSummary] = {
    import spark.implicits._

    def close(convId: String, s: SessionState, how: String) =
      SessionSummary(convId, s.nTurns, new Timestamp(s.startMs), new Timestamp(s.lastMs), how)

    def fn(convId: String, events: Iterator[(String, Timestamp)],
           state: GroupState[SessionState]): Iterator[SessionSummary] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(close(convId, s, "timeout"))
      } else {
        val times = events.map(_._2.getTime).toVector.sorted
        val out = Vector.newBuilder[SessionSummary]
        var cur = state.getOption
        times.foreach { t =>
          cur match {
            case Some(s) if t - s.lastMs > gapMs =>
              out += close(convId, s, "gap")
              cur = Some(SessionState(1, t, t))
            case Some(s) if s.startMs - t > gapMs =>
              // a LATE event more than a gap BEFORE the open session
              // (flatMapGroupsWithState still delivers sub-watermark rows):
              // it is its own, already-closed earlier session — merging it
              // would fabricate one session spanning the silence
              out += close(convId, SessionState(1, t, t), "gap")
            case Some(s) =>
              cur = Some(SessionState(s.nTurns + 1, math.min(s.startMs, t), math.max(s.lastMs, t)))
            case None =>
              cur = Some(SessionState(1, t, t))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close by timeout once the watermark passes the gap horizon;
          // never set a timeout at-or-before the current watermark
          val horizon = s.lastMs + gapMs
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(math.max(horizon, wm + 1))
        }
        out.result().iterator
      }
    }

    turns.withWatermark("ts", watermark)
      .select(col("conv_id"), col("ts"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
