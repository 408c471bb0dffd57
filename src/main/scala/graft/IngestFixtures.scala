package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic messy-CSV renderers over the `events` test table, so the
  * adaptive-ingest operators (dialect detection, vertical transposition)
  * are exercised inside driver-oracle queries: the CSV is rendered from
  * events, parsed back through the full ingest pipeline, and compared to
  * SQL computing the same slice directly.
  */
object IngestFixtures {

  private def slice(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("event_id") < 40)
      .select(
        lpad(col("event_id").cast("string"), 6, "0").as("id"),
        col("event_type").as("etype"),
        round(col("value") * 100).cast("long").cast("string").as("cents"))
      .orderBy("id")
      .collect()

  /** Vertical key-value drop: anchor-key repetition marks record
    * boundaries (the transposer's contract).
    */
  def verticalKvCsv(spark: SparkSession, sfDir: String): String =
    slice(spark, sfDir).map { r =>
      s"event_id,${r.getString(0)}\netype,${r.getString(1)}\nnote,n${r.getString(2)}"
    }.mkString("", "\n", "\n")

  val verticalOracleSql: String =
    """SELECT lpad(CAST(event_id AS VARCHAR), 6, '0') AS event_id,
      |  event_type AS etype,
      |  'n' || CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR) AS note
      |FROM events WHERE event_id < 40 ORDER BY event_id""".stripMargin

  /** Horizontal European-style drop: `;` delimiter with the delimiter
    * quoted inside a cell (dialect detection must pick `;`/`"`).
    */
  def semicolonCsv(spark: SparkSession, sfDir: String): String =
    "event_id;etype;note\n" +
      slice(spark, sfDir).map { r =>
        s"""${r.getString(0)};${r.getString(1)};"v; ${r.getString(2)}""""
      }.mkString("", "\n", "\n")

  val semicolonOracleSql: String =
    """SELECT lpad(CAST(event_id AS VARCHAR), 6, '0') AS event_id,
      |  event_type AS etype,
      |  'v; ' || CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR) AS note
      |FROM events WHERE event_id < 40 ORDER BY event_id""".stripMargin
}
