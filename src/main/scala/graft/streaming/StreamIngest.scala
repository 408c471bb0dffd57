package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.Sanitize
import graft.ingest.Dialect
import graft.lake.LakeTable
import graft.maintain.MergeInto

/** Structured Streaming ingest: transcript CSV drops landing in a directory
  * are continuously sanitized and MERGE'd into the lake table, one
  * micro-batch per file group.
  *
  * The reference has no streaming (a 60-min APScheduler cron,
  * backend/app/main.py:40-46); this is the Spark-native upgrade of that
  * loop. Exactly-once effect: the stream checkpoint gives at-least-once
  * foreachBatch delivery, and re-merging an identical batch is a semantic
  * no-op (non-empty-wins with identical values reproduces the same table),
  * so replays converge.
  */
object StreamIngest {

  /** All-string CSV schema for drops with the given header columns. */
  def dropSchema(columns: Seq[String]): StructType =
    StructType(columns.map(c => StructField(c, StringType)))

  /** Start the ingest stream over `dropDir` (CSV files with `columns`
    * headers, `dialect` separators). Each micro-batch is sanitized
    * column-wise and merged keyed (conv_id, turn_idx).
    */
  def start(table: LakeTable, dropDir: String, columns: Seq[String],
            dialect: Dialect = Dialect.Excel,
            checkpointDir: Option[String] = None): StreamingQuery = {
    val spark = table.spark
    val raw = spark.readStream
      .schema(dropSchema(columns))
      .option("header", "true")
      // enforceSchema=false makes Spark VALIDATE each file's header against
      // the declared column names — by default it binds positionally and a
      // drop with reordered headers would silently mis-assign every column
      // (the reference's DictReader maps by NAME; failing loudly is the
      // closest safe streaming equivalent).
      .option("enforceSchema", "false")
      .option("sep", dialect.delimiter.toString)
      .option("quote", dialect.quote.toString)
      .option("maxFilesPerTrigger", "32")
      .csv(dropDir)

    // No `_seq` is set here: MergeInto derives a partition-major row id for
    // duplicate-key resolution, matching per-file read order within each
    // micro-batch (reference semantics: later lines overwrite non-empty).
    val sanitized = sanitizeAll(raw)

    sanitized.writeStream
      .option("checkpointLocation",
        checkpointDir.getOrElse(table.root + "/_stream_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          MergeInto.merge(table, batch, s"stream-$batchId")
          ()
        }
      }
      .start()
  }

  /** Sanitize every string cell (the reference applies sanitize to all
    * cells during parse, csv_handler.py:107).
    */
  def sanitizeAll(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => Sanitize.sanitizeCell(col(s"`$c`")).as(c.trim)).toIndexedSeq: _*)
}
