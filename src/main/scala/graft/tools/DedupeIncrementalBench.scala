package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.maintain.{Clustering, Dedupe, DeleteFrom, MergeInto, Sketches}
import graft.synth.TranscriptSynth

/** Incremental-maintenance evidence for the dedup + retention cadence: at
  * scale the sketch build (full decompress-and-hash of every text)
  * dominates a dedup pass, and a retention delete that rewrites clean
  * files dominates a retention tick — so this bench pins FOUR claims:
  *
  *   1. cold:   the first coverage pass sketches every file once;
  *   2. warm:   an unchanged corpus re-sketches NOTHING (pure metadata);
  *   3. write-path: a merge drop / full recluster arrives ALREADY covered
  *      (its own write computed the sketches) — ensure heals zero files,
  *      so layout maintenance no longer invalidates the store;
  *   4. retention: a DELETE of an event-time slice rewrites only the
  *      files whose ts range can hold expired rows — cost tracks expired
  *      rows, not table size.
  *
  * Prints one JSON line and appends a table to BENCH.md.
  *
  * Usage: `runMain graft.tools.DedupeIncrementalBench [nConvs]` (default 20000).
  */
object DedupeIncrementalBench {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // shuffle partitions scale with cores so a taskset-pinned small run
      // is a faithful small-cluster stand-in (same rule as ScalingBench)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Paths.get("target", "bench-dedupe-incr")
    LakeTable.deleteRecursively(root)
    val t = LakeTable.create(spark, root.toString, TranscriptSynth.schema)
    t.append(TranscriptSynth.turns(spark, nConvs, seed = 7L)
      .repartitionByRange(32, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions("conv_id", "turn_idx"), "load")
    val totalRows = t.currentFiles.map(_.rows).sum

    // phase 1: cold — every file sketches into one consolidated batch
    val (s1, tSketch1) = timed(Sketches.ensure(t))
    // phase 2: warm — same corpus, pure metadata (no per-file stats at all)
    val (s2, tSketch2) = timed(Sketches.ensure(t))

    // a small drop (~1% of conversations) lands as new files via MERGE;
    // the ACTIVE store makes the merge write sketch its own output
    val drop = TranscriptSynth.turns(spark, nConvs / 100, seed = 8L)
      .withColumn("conv_id", concat(lit("z"), col("conv_id")))
      .withColumn("turn_idx", col("turn_idx").cast("string"))
      .withColumn("_seq", monotonically_increasing_id())
    MergeInto.merge(t, drop, "incr-drop")

    // phase 3: post-drop ensure heals NOTHING (write-path coverage)
    val (s3, tSketch3) = timed(Sketches.ensure(t))

    // phase 4: a full recluster rewrites the layout — its outputs arrive
    // covered too, so the dedup cadence survives layout maintenance.
    // File size scaled to the bench table (~32 files) so the retention
    // phase below has a real layout to prune against.
    Clustering.cluster(t, "bench-recluster",
      targetFileRows = math.max(1000L, totalRows / 32), incremental = false)
    val (s4, tSketch4) = timed(Sketches.ensure(t))

    // full minhash dedup pass over the covered corpus: its sketch cost
    // is the store read, not a recompute (file size kept at the bench
    // table's ~32-file layout)
    val (res, tPass) = timed(Dedupe.runPass(t, "bench-pass", mode = "minhash",
      targetFileRows = math.max(1000L, totalRows / 32)))

    // phase 5: retention tick — expire the oldest ~5% of event time; the
    // ts-stat prune must rewrite only the files that can hold expired rows
    val nFiles = t.currentFiles.size
    val minTs = t.currentFiles.flatMap(_.minTsUs).min
    val maxTs = t.currentFiles.flatMap(_.maxTsUs).max
    val cutoffUs = minTs + (maxTs - minTs) / 20
    val (ret, tRet) = timed(DeleteFrom.run(t, "bench-retention",
      s"ts < timestamp_micros(${cutoffUs}L)"))

    val line =
      s"""{"rows":$totalRows,"files":${s1.totalFiles},""" +
        s""""cold_sketch_files":${s1.computedFiles},"cold_sketch_sec":$tSketch1,""" +
        s""""warm_sketch_files":${s2.computedFiles},"warm_sketch_sec":$tSketch2,""" +
        s""""post_drop_sketch_files":${s3.computedFiles},"post_drop_sketch_sec":$tSketch3,""" +
        s""""post_recluster_sketch_files":${s4.computedFiles},"post_recluster_sketch_sec":$tSketch4,""" +
        s""""dedup_pass_sec":$tPass,"dup_rows_removed":${res.duplicateRows},""" +
        s""""retention_files":$nFiles,"retention_touched":${ret.touchedFiles},""" +
        s""""retention_rows_deleted":${ret.deletedRows},"retention_sec":$tRet}"""
    println(line)

    val md = new StringBuilder
    md.append(s"\n## Incremental sketch store + retention (${java.time.Instant.now()}, " +
      s"$totalRows turns, ${s1.totalFiles} files)\n\n")
    md.append("| phase | files sketched | sec |\n|---|---|---|\n")
    md.append(f"| cold (first coverage pass) | ${s1.computedFiles} | $tSketch1%.1f |\n")
    md.append(f"| warm (unchanged corpus) | ${s2.computedFiles} | $tSketch2%.1f |\n")
    md.append(f"| after ~1%% merge drop | ${s3.computedFiles} | $tSketch3%.1f |\n")
    md.append(f"| after FULL recluster | ${s4.computedFiles} | $tSketch4%.1f |\n")
    md.append(f"\nFull minhash dedup pass on the covered corpus: $tPass%.1f s " +
      f"(${res.duplicateRows} duplicate turns removed; signatures read from " +
      "the consolidated batch store, zero recompute). Coverage lives in " +
      "manifest entries and every write sketches its own output, so a merge " +
      "drop or a full recluster leaves ensure() with NOTHING to heal — the " +
      "warm path is pure metadata (no per-file filesystem stats).\n")
    md.append(f"\nRetention tick (oldest ~5%% of event time): " +
      f"${ret.deletedRows} rows deleted, ${ret.touchedFiles} of $nFiles files " +
      f"rewritten in $tRet%.1f s — the per-file ts min/max stats prune the " +
      "candidate set, so the tick's cost tracks expired rows, not table size.\n")
    val benchMd = Paths.get("BENCH.md")
    val existing = if (Files.exists(benchMd)) Files.readString(benchMd) else "# BENCH\n"
    Files.writeString(benchMd, existing + md)
    spark.stop()
  }
}
