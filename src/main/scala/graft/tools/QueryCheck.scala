package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch runner: execute one SparkEntry query by name and show its rows
  * (surface full analysis errors the batch Verify log truncates).
  * Usage: runMain graft.tools.QueryCheck <queryName> <sfDir>
  */
object QueryCheck {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q30_sessionize_batch")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.show(5, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
