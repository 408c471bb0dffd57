package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.Sanitize

/** Vertical key-value transposition (reference:
  * backend/app/services/transposer.py:17-66) re-expressed as window + pivot.
  *
  * Reference semantics preserved:
  *   - skip empty rows and rows with empty/whitespace keys;
  *   - key is trimmed, value sanitized; missing value -> "";
  *   - record boundary: re-occurrence of the FIRST key of the file (each
  *     occurrence after the first starts a new record — in the reference's
  *     state machine the anchor is always present in `current_record` when
  *     seen again, transposer.py:44-46);
  *   - within a record, a repeated key overwrites (last wins,
  *     transposer.py:51);
  *   - field order = first-seen order (transposer.py:48-49).
  *
  * The sequential rule is a running `sum` over a per-file window ordered by
  * line number — the one genuinely order-dependent computation in the whole
  * ingest path. Each drop file is a single window partition (drops are
  * <= 50 MB by the reference's upload cap), so at scale parallelism comes
  * from MANY drops, not from splitting one drop.
  */
object Transposer {

  /** Transpose (file, line_no, line) rows; `dialect` applies to all files.
    * Returns one row per (file, record) with pivoted key columns in
    * first-seen order (union across files; per-file missing keys -> null).
    */
  def transposeLines(lines: DataFrame, dialect: Dialect): DataFrame = {
    val opts = Map("sep" -> dialect.delimiter.toString, "quote" -> dialect.quote.toString)
    val kvSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))

    val parsed = lines
      .where(col("line").isNotNull && trim(col("line")) =!= "")
      .withColumn("kv", from_csv(col("line"), kvSchema, opts))
      .withColumn("key", Sanitize.stripWs(coalesce(col("kv.k"), lit(""))))
      .where(col("key") =!= "")
      .withColumn("val", Sanitize.sanitizeCell(col("kv.v")))
      .select(col("file"), col("line_no").cast(LongType), col("key"), col("val"))

    val w = Window.partitionBy("file").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRec = parsed
      .withColumn("anchor", first(col("key")).over(w))
      .withColumn("rec_id",
        greatest(sum(when(col("key") === col("anchor"), 1).otherwise(0)).over(w) - 1, lit(0)))

    // First-seen key order (across the whole input) for output column order.
    val keyOrder = withRec.groupBy("key").agg(min("line_no").as("first_line"))
      .orderBy("first_line").select("key").collect().map(_.getString(0)).toSeq

    val pivoted = withRec.groupBy(col("file"), col("rec_id"))
      .pivot("key", keyOrder)
      .agg(max_by(col("val"), col("line_no"))) // last value wins within record
      .orderBy("file", "rec_id")
    pivoted
  }

  /** Single-drop convenience mirroring `parse_vertical_csv(content, dialect)`:
    * returns (records DataFrame without bookkeeping cols, fields first-seen).
    */
  def parseVerticalCsv(spark: SparkSession, content: String, dialect: Dialect): (DataFrame, Seq[String]) = {
    import spark.implicits._
    val lines = splitContentToLines(spark, content)
    val out = transposeLines(lines, dialect)
    val fields = out.columns.filterNot(c => c == "file" || c == "rec_id").toSeq
    (out.drop("file", "rec_id"), fields)
  }

  /** (file, line_no, line) from a raw content string (driver-provided). */
  def splitContentToLines(spark: SparkSession, content: String): DataFrame = {
    import spark.implicits._
    Seq(("inline", content)).toDF("file", "content")
      .select(col("file"), posexplode(split(col("content"), "\r\n|\r|\n")))
      .toDF("file", "line_no", "line")
  }

  /** (file, line_no, line) for a directory/glob of drop files, one wholetext
    * row per file then posexplode — keeps per-file line order deterministic
    * without RDDs and parallelizes across drops.
    */
  def readFileLines(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value"))
      .select(col("file"), posexplode(split(col("value"), "\r\n|\r|\n")))
      .toDF("file", "line_no", "line")
  }
}
