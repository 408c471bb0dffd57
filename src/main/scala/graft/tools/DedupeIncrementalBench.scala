package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.maintain.{Dedupe, MergeInto, Sketches}
import graft.synth.TranscriptSynth

/** Incremental-sketch evidence for the dedup maintenance cadence: at scale
  * the sketch build (full decompress-and-hash of every text) dominates a
  * dedup pass, so the lake-managed per-file sketch store must make pass 2
  * over an unchanged corpus do ~ZERO sketch compute, and a pass after a
  * small drop compute only the drop's files.
  *
  * Prints one JSON line per phase and appends a table to BENCH.md.
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

    // phase 1: cold — every file sketches
    val (s1, tSketch1) = timed(Sketches.ensure(t))
    // phase 2: warm — same corpus, zero compute
    val (s2, tSketch2) = timed(Sketches.ensure(t))

    // a small drop (~1% of conversations) lands as new files via MERGE
    val drop = TranscriptSynth.turns(spark, nConvs / 100, seed = 8L)
      .withColumn("conv_id", concat(lit("z"), col("conv_id")))
      .withColumn("turn_idx", col("turn_idx").cast("string"))
      .withColumn("_seq", monotonically_increasing_id())
    MergeInto.merge(t, drop, "incr-drop")

    // phase 3: only the merge's output files sketch
    val (s3, tSketch3) = timed(Sketches.ensure(t))

    // full minhash dedup pass over the now-covered corpus: its sketch cost
    // is the store read, not a recompute
    val (res, tPass) = timed(Dedupe.runPass(t, "bench-pass", mode = "minhash"))

    val line =
      s"""{"rows":$totalRows,"files":${s1.totalFiles},""" +
        s""""cold_sketch_files":${s1.computedFiles},"cold_sketch_sec":$tSketch1,""" +
        s""""warm_sketch_files":${s2.computedFiles},"warm_sketch_sec":$tSketch2,""" +
        s""""post_drop_sketch_files":${s3.computedFiles},"post_drop_sketch_sec":$tSketch3,""" +
        s""""dedup_pass_sec":$tPass,"dup_rows_removed":${res.duplicateRows}}"""
    println(line)

    val md = new StringBuilder
    md.append(s"\n## Incremental sketch store (${java.time.Instant.now()}, " +
      s"$totalRows turns, ${s1.totalFiles} files)\n\n")
    md.append("| phase | files sketched | sec |\n|---|---|---|\n")
    md.append(f"| cold (first pass) | ${s1.computedFiles} | $tSketch1%.1f |\n")
    md.append(f"| warm (unchanged corpus) | ${s2.computedFiles} | $tSketch2%.1f |\n")
    md.append(f"| after ~1%% merge drop | ${s3.computedFiles} | $tSketch3%.1f |\n")
    md.append(f"\nFull minhash dedup pass on the covered corpus: $tPass%.1f s " +
      f"(${res.duplicateRows} duplicate turns removed; signatures read from " +
      "the store, zero recompute). Sketch cost is once-per-immutable-file: " +
      "an unchanged corpus re-sketches nothing and a drop re-sketches only " +
      "its own files.\n")
    val benchMd = Paths.get("BENCH.md")
    val existing = if (Files.exists(benchMd)) Files.readString(benchMd) else "# BENCH\n"
    Files.writeString(benchMd, existing + md)
    spark.stop()
  }
}
