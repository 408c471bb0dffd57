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

  /** Batch-mode twin of [[sessionize]]: the identical gap rule over a
    * static frame via lag + running-sum session ids — one shuffle on the
    * conversation key, ANSI-SQL expressible (it is the driver oracle for
    * the streaming semantics), and the unit-level cross-check that the
    * stateful path emits exactly these sessions. Expects (conv_id, ts);
    * returns (conv_id, sess_idx, n_turns, start_ts, end_ts).
    */
  def sessionizeBatch(turns: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("ts")
    val run = Window.partitionBy("conv_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_millis(col("ts")) - unix_millis(col("__prev")) > gapMs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("__new")).over(run))
      .groupBy(col("conv_id"), col("sess_idx"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
  }

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
        // Gap-merge the batch's events AND the open session in ONE pass over
        // time order — the open session participates as an interval at its
        // sorted position. This makes sub-watermark LATE events (which
        // flatMapGroupsWithState still delivers) behave exactly like the
        // batch gap rule: consecutive late events within gapMs of each other
        // coalesce into ONE earlier session (not one fabricated session per
        // event), and a late chain reaching within gapMs of the open
        // session's start simply merges into it.
        val times = events.map(_._2.getTime).toVector.sorted
        val ivs = (state.getOption.map(s => (s.startMs, s.lastMs, s.nTurns)).toVector ++
          times.map(t => (t, t, 1L))).sortBy(iv => (iv._1, iv._2))
        val merged = ivs.foldLeft(Vector.empty[(Long, Long, Long)]) {
          case (acc, iv @ (st, en, n)) => acc.lastOption match {
            case Some((pst, pen, pn)) if st - pen <= gapMs =>
              acc.init :+ ((pst, math.max(pen, en), pn + n))
            case _ => acc :+ iv
          }
        }
        // everything but the LAST interval closed by a later-event gap; the
        // last stays open in state until its own gap or timeout
        val out = merged.init.map { case (st, en, n) =>
          close(convId, SessionState(n, st, en), "gap")
        }
        merged.lastOption.foreach { case (st, en, n) =>
          val s = SessionState(n, st, en)
          state.update(s)
          // close by timeout once the watermark passes the gap horizon;
          // never set a timeout at-or-before the current watermark
          val horizon = s.lastMs + gapMs
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(math.max(horizon, wm + 1))
        }
        out.iterator
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
