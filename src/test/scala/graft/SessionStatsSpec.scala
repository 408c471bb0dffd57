package graft

import java.nio.file.Paths
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SessionStats

/** Event-time streaming operators: watermarked window agg and
  * flatMapGroupsWithState sessionization, driven through MemoryStream with
  * controlled event times.
  */
class SessionStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z

  private def ts(offsetSec: Long) = new Timestamp(T0 + offsetSec * 1000)

  test("windowed turn counts with watermark") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.classic.SQLContext = classic.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val counts = SessionStats.windowedTurnCounts(
      in.toDF().toDF("conv_id", "ts"), windowDur = "1 minute", watermark = "1 minute")
    val q = counts.writeStream.format("memory").queryName("wcounts")
      .outputMode("append")
      .option("checkpointLocation",
        Paths.get("target", "test-stream", "wc-" + System.nanoTime()).toString)
      .start()
    try {
      in.addData(("a", ts(0)), ("a", ts(10)), ("a", ts(70)), ("b", ts(5)))
      q.processAllAvailable()
      // push the watermark far past the first windows so they finalize
      in.addData(("a", ts(600)))
      q.processAllAvailable()
      val rows = spark.table("wcounts")
        .select("conv_id", "n_turns").orderBy("conv_id", "n_turns")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows.contains(("a", 2L)), s"window [0,60) of a: $rows") // ts 0,10
      assert(rows.contains(("a", 1L))) // ts 70
      assert(rows.contains(("b", 1L)))
    } finally q.stop()
  }

  test("streaming sessionize emits exactly the batch twin's sessions") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.classic.SQLContext = classic.sqlContext
    val data = Seq(
      ("a", 0L), ("a", 30L), ("a", 45L), ("a", 200L), ("a", 230L),
      ("b", 10L), ("b", 80L), ("b", 130L),
      ("c", 5L)).map { case (c, off) => (c, ts(off)) }

    val in = MemoryStream[(String, Timestamp)]
    val sessions = SessionStats.sessionize(spark,
      in.toDF().toDF("conv_id", "ts"), gapMs = 60000, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("xcheck")
      .outputMode("append")
      .option("checkpointLocation",
        Paths.get("target", "test-stream", "xc-" + System.nanoTime()).toString)
      .start()
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      // two sentinel batches: advance the watermark past every gap horizon
      // so trailing sessions close by timeout
      in.addData(("zz", ts(100000))); q.processAllAvailable()
      in.addData(("zz", ts(200000))); q.processAllAvailable()
      val streamed = spark.table("xcheck")
        .where(col("conv_id") =!= "zz")
        .select("conv_id", "n_turns", "start_ts", "end_ts")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toSet
      val batch = SessionStats.sessionizeBatch(
        data.toDF("conv_id", "ts"), gapMs = 60000)
        .select("conv_id", "n_turns", "start_ts", "end_ts")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toSet
      assert(streamed == batch,
        s"streaming $streamed\nvs batch $batch")
    } finally q.stop()
  }

  test("late events within a gap of each other coalesce into one session") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.classic.SQLContext = classic.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    // a LAGGING watermark (10 min delay) is what lets genuinely-late rows
    // through to the state function — with delay 0 Spark pre-filters them
    val sessions = SessionStats.sessionize(spark,
      in.toDF().toDF("conv_id", "ts"), gapMs = 60000, watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("late")
      .outputMode("append")
      .option("checkpointLocation",
        Paths.get("target", "test-stream", "lt-" + System.nanoTime()).toString)
      .start()
    try {
      in.addData(("a", ts(1000))) // opens a session at t=1000s; wm -> 400s
      q.processAllAvailable()
      // three late events (above the 400 s watermark, but more than a gap
      // BEFORE the open session), mutually within the 60 s gap: they must
      // form ONE earlier session, not three fabricated ones
      in.addData(("a", ts(500)), ("a", ts(520)), ("a", ts(540)))
      q.processAllAvailable()
      val rows = spark.table("late")
        .select("conv_id", "n_turns", "closed_by")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      assert(rows == Seq(("a", 3L, "gap")),
        s"expected one coalesced 3-turn late session, got $rows")
    } finally q.stop()
  }

  test("sessionize: gap close, timeout close, state cleared") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.classic.SQLContext = classic.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val sessions = SessionStats.sessionize(spark,
      in.toDF().toDF("conv_id", "ts"), gapMs = 60000, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation",
        Paths.get("target", "test-stream", "ss-" + System.nanoTime()).toString)
      .start()
    try {
      // conv a: 3 turns within the gap; conv b: 1 turn
      in.addData(("a", ts(0)), ("a", ts(20)), ("a", ts(40)), ("b", ts(10)))
      q.processAllAvailable()
      // a new event for `a` 5 minutes later closes a's first session by GAP
      in.addData(("a", ts(340)))
      q.processAllAvailable()
      val afterGap = spark.table("sessions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(4)))
      assert(afterGap.contains(("a", 3L, "gap")), s"got ${afterGap.toSeq}")

      // advance the watermark far beyond everything: b's session (and a's
      // trailing one) close by TIMEOUT
      in.addData(("c", ts(2000)))
      q.processAllAvailable()
      in.addData(("c", ts(4000)))
      q.processAllAvailable()
      val all = spark.table("sessions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(4))).toSet
      assert(all.contains(("b", 1L, "timeout")), s"got $all")
      assert(all.contains(("a", 1L, "timeout")), "a's trailing 1-turn session")
    } finally q.stop()
  }
}
