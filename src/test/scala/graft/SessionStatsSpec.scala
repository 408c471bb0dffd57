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
