package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.lake.LakeTable
import graft.maintain.DeleteFrom

/** Retention-tick cost at BENCH scale: run the event-time DELETE against an
  * EXISTING clustered table (e.g. the 88.5M-turn ScalingBench table) and
  * report how many files the per-file ts stats let it skip — the round-5
  * claim ("a tick's cost tracks expired rows, not table size") evidenced at
  * the same scale as the maintenance-throughput headline.
  *
  * Usage: `runMain graft.tools.RetentionAtScaleBench <tableRoot> [fraction]`
  * (fraction of the event-time span to expire, default 0.05).
  */
object RetentionAtScaleBench {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("target/scalebench/c8")
    val fraction = args.lift(1).map(_.toDouble).getOrElse(0.05)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = LakeTable.load(spark, root)
    val files = t.currentFiles
    val rows = files.map(_.rows).sum
    require(files.forall(_.minTsUs.isDefined),
      "table has no per-file ts stats (written before TIMESTAMP_MICROS?)")
    val minTs = files.flatMap(_.minTsUs).min
    val maxTs = files.flatMap(_.maxTsUs).max
    val cutoffUs = minTs + ((maxTs - minTs) * fraction).toLong

    val t0 = System.nanoTime()
    val res = DeleteFrom.run(t, s"retention-${System.nanoTime()}",
      s"ts < timestamp_micros(${cutoffUs}L)",
      targetFileRows = math.max(10000L, rows / 64))
    val sec = (System.nanoTime() - t0) / 1e9

    val line =
      s"""{"rows":$rows,"files":${files.size},""" +
        s""""expired_rows":${res.deletedRows},"touched_files":${res.touchedFiles},""" +
        s""""candidate_files":${res.prunedCandidateFiles},""" +
        s""""matching_files":${res.candidateFiles},"carried_files":${res.carriedFiles},""" +
        s""""fraction":$fraction,"sec":$sec}"""
    println(line)

    val md = new StringBuilder
    md.append(f"\n## Retention tick at bench scale (${java.time.Instant.now()}, " +
      f"$rows turns, ${files.size} files, local[$cpus])\n\n")
    md.append(f"`ts < min + ${fraction * 100}%.0f%%-of-span` deleted " +
      f"${res.deletedRows} rows touching ${res.touchedFiles} of ${files.size} " +
      f"files (${res.prunedCandidateFiles} candidates after the ts-stat prune, " +
      f"${res.candidateFiles} actually containing victims; " +
      f"${res.carriedFiles} carried untouched) in $sec%.1f s — " +
      "the tick reads and rewrites only the event-time slab holding expired " +
      "rows; at 10^12 turns the same plan touches the same FRACTION, not " +
      "the same table.\n")
    val benchMd = Paths.get("BENCH.md")
    val existing = if (Files.exists(benchMd)) Files.readString(benchMd) else "# BENCH\n"
    Files.writeString(benchMd, existing + md)
    spark.stop()
  }
}
