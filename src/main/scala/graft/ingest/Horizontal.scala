package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Sanitize

/** Horizontal (standard) CSV parsing with a detected dialect, followed by
  * the reference's row/field sanitization (csv_handler.py:100-143):
  * header names trimmed, empty header names dropped, every cell trimmed +
  * formula-escape sanitized, null cells -> "".
  *
  * Uses Spark's CSV datasource (uniVocity, vectorized) — the scan, the
  * sanitize projection and any downstream filter all stay in one
  * whole-stage-codegen pass.
  */
object Horizontal {

  def readCsv(spark: SparkSession, path: String, dialect: Dialect): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("sep", dialect.delimiter.toString)
      .option("quote", dialect.quote.toString)
      .option("mode", "PERMISSIVE")
      .option("inferSchema", "false")
      .csv(path)
    sanitizeColumns(raw)
  }

  /** Parse an in-memory content string (single drop). */
  def parseContent(spark: SparkSession, content: String, dialect: Dialect): DataFrame = {
    import spark.implicits._
    val lines = content.split("\r\n|\r|\n", -1).toIndexedSeq
    val ds = spark.createDataset(lines)
    val raw = spark.read
      .option("header", "true")
      .option("sep", dialect.delimiter.toString)
      .option("quote", dialect.quote.toString)
      .option("mode", "PERMISSIVE")
      .csv(ds)
    sanitizeColumns(raw)
  }

  /** Trim header names, drop empty-named columns, sanitize every cell. */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val keep = df.columns.filter(_.trim.nonEmpty)
    val cols = keep.map(c => Sanitize.sanitizeCell(col(s"`$c`")).as(c.trim))
    val projected = df.select(cols.toIndexedSeq: _*)
    // Reference `_sanitize_row` drops rows whose sanitized dict is empty —
    // with a fixed header that is only the no-columns case, handled above.
    projected
  }
}
