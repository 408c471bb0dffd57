package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextMetrics, ZOrder}
import graft.ingest.Ingest

/** Library-surface demo: adaptive ingest of messy CSV drops + the analysis
  * functions, end-to-end through the public API. Run with
  * `sbt "runMain graft.tools.IngestDemo"`.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. Messy European horizontal drop: semicolon delimiter, quoted
    // delimiter inside a cell, a formula-injection payload, padded header.
    val euDrop =
      "conv_id; turn_idx ;role;text\n" +
      "c001;0;user;\"hello; world\"\n" +
      "c001;1;assistant;=SUM(A1:B2)\n" +
      "c002;0;user;ok\n"
    val eu = Ingest.parseContent(spark, euDrop)
    println(s"[demo] dialect=${eu.dialect} vertical=${eu.vertical} fields=${eu.fields}")
    eu.records.show(false)

    // 2. Vertical KV drop with anchor-repetition record boundary.
    val vkv = "conv_id,c010\nturn_idx,0\ntext,=cmd\nconv_id,c010\nturn_idx,1\ntext,fine\n"
    val v = Ingest.parseContent(spark, vkv)
    println(s"[demo] dialect=${v.dialect} vertical=${v.vertical} fields=${v.fields}")
    v.records.show(false)

    // 3. Analysis functions over the ingested records.
    eu.records
      .withColumn("zkey", ZOrder.clusterKey(col("conv_id"), col("turn_idx").cast("int")))
      .withColumn("n_tokens", TextMetrics.tokenCount(col("text")))
      .withColumn("simhash", Dedup.simhash64(col("text")))
      .show(false)

    spark.stop()
  }
}
