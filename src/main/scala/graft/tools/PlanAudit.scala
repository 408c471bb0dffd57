package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftx.Bridge

import graft.SparkEntry

/** Plan-evidence dump: EXPLAIN FORMATTED for the queries whose physical
  * shape carries the scale argument (sketch builds, banded joins, lake
  * scans, the optimizer-planned SQL path). One file per query under
  * `outDir`, plus a summary of scan/exchange/codegen counts on stdout —
  * the raw material for BENCH.md's plan-audit section.
  *
  * Usage: `sbt "runMain graft.tools.PlanAudit [sfDir] [outDir]"`
  */
object PlanAudit {

  val Audited: Seq[String] = Seq(
    "q01_agg_filter", "q03_join_agg", "q14_jaccard_pairs", "q15_minhash_lsh",
    "q16b_simhash_pairs", "q18b_ann_lsh", "q21_lake_pruned_scan",
    "q29_sql_pruned_scan", "q30_sessionize_batch", "q31_dedup_groups",
    "q32_ann_ivf")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/plans")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    Audited.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = Bridge.explainFormatted(df)
      Files.writeString(Paths.get(outDir, s"$name.txt"), txt)
      // the FINAL adaptive plan (after execution) shows what actually ran:
      // reused exchanges/subtrees, AQE-chosen join strategies, skew splits.
      // collect() (not count()) — count() builds a DIFFERENT query whose
      // execution would leave this Dataset's own adaptive plan unfinalized.
      df.collect()
      val fin = Bridge.executedPlanOf(df).toString
      Files.writeString(Paths.get(outDir, s"$name-final.txt"), fin)
      def count(t: String, needle: String): Int = t.sliding(needle.length).count(_ == needle)
      println(f"$name%-22s staticScans=${count(txt, "Scan parquet") / 2}%2d " +
        f"reusedExchanges=${count(fin, "ReusedExchange")}%d " +
        f"reusedSubtrees=${count(fin, "ReusedSubquery")}%d " +
        f"codegenSpans=${"""\*\((\d+)\)""".r.findAllMatchIn(fin).map(_.group(1)).toSet.size}%2d " +
        f"pushedFilters=${if (txt.contains("PushedFilters: [")) "yes" else "no"} " +
        f"bhj=${count(fin, "BroadcastHashJoin")}%d smj=${count(fin, "SortMergeJoin")}%d")
    }
    spark.stop()
  }
}
