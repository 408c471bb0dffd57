package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.maintain._
import graft.synth.TranscriptSynth

/** Maintenance-engine surface demo: synth -> load -> MERGE -> compact ->
  * cluster -> pruned scan -> manifest rewrite -> expire, printing each
  * snapshot and the prune ratio. Run:
  * `sbt "runMain graft.tools.LakeDemo target/lake-demo"`.
  */
object LakeDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("target/lake-demo")
    graft.lake.LakeTable.deleteRecursively(java.nio.file.Paths.get(root))

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-lake-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t = LakeTable.create(spark, root, TranscriptSynth.schema)
    val data = TranscriptSynth.turns(spark, nConvs = 500, seed = 42L)
    t.append(data.repartition(40), "init")
    println(s"[lake] loaded ${t.currentFiles.map(_.rows).sum} turns in ${t.currentFiles.size} files")

    println("[lake] pre-merge rows for c00000007 turns 0-1:")
    t.scan(convRange = Some(("c00000007", "c00000007"))).df
      .where(col("turn_idx") <= 1).orderBy("turn_idx")
      .select("conv_id", "turn_idx", "text").show(false)

    // every synth conversation has >= 2 turns, so turns 0/1 always exist
    val staged = Seq(
      ("c00000007", "0", "assistant", "=2+2 updated by merge", "", 100L),
      ("c00000007", "1", "", "", "", 101L), // empty: must not clobber
      ("c77777777", "0", "user", "brand new conversation", "", 102L)
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "_seq")
    val m = MergeInto.merge(t, staged, "drop-a")
    println(s"[lake] merge: snapshot=${m.snapshot.id} touched=${m.touchedFiles} carried=${m.carriedFiles} rejected=${m.rejectedRows}")

    val c = Compaction.compact(t, "compact-1")
    println(s"[lake] compact: bins=${c.bins} files now=${t.currentFiles.size}")

    val cl = Clustering.cluster(t, "cluster-1", targetFileRows = 2000)
    println(s"[lake] cluster: groups=${cl.groups} rows=${cl.rowsRewritten} files now=${t.currentFiles.size}")

    val scan = t.scan(convRange = Some(("c00000100", "c00000119")))
    println(f"[lake] pruned scan: ${scan.prune.selectedFiles}/${scan.prune.totalFiles} files selected, prune ratio ${scan.prune.ratio}%.3f")
    scan.df.orderBy("conv_id", "turn_idx").show(5, false)

    println("[lake] post-merge rows (turn 0 updated+sanitize-escaped upstream, turn 1 unchanged):")
    t.scan(convRange = Some(("c00000007", "c00000007"))).df
      .where(col("turn_idx") <= 1).orderBy("turn_idx")
      .select("conv_id", "turn_idx", "text").show(false)

    // a second drop (with a planted duplicate-text turn), then ONE
    // maintenance-cycle call (the cron analogue): compact new debris,
    // DEDUPE duplicate texts (sketch-store-backed), incrementally recluster
    // the dirty slab, expire, GC
    val staged2 = Seq(
      ("c00000042", "0", "user", "second drop", "", 200L),
      ("c88888888", "0", "user", "brand new conversation", "", 201L) // dup of c77777777/0
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "_seq")
    MergeInto.merge(t, staged2, "drop-b")
    val cyc = Maintenance.runCycle(t, "cycle-1", targetFileRows = 2000,
      groupTargetBytes = 64L << 10, retainLast = 3,
      dedupeMode = Some("minhash"))
    println(s"[lake] cycle: ${cyc.summary}")
    println(s"[lake] dup of c77777777/0 deduped: " +
      s"${t.scan(convRange = Some(("c88888888", "c88888888"))).df.count()} rows remain for c88888888")

    ManifestRewrite.rewrite(t, entriesPerManifest = 5)
    val ex = Expire.expire(t, retainLast = 1)
    println(s"[lake] expired snapshots=${ex.expiredSnapshots.mkString(",")} deletedData=${ex.deletedDataFiles.size} failures=${ex.failures.size}")
    println(s"[lake] final snapshots=${t.committedSnapshots.map(s => s.id + ":" + s.operation).mkString(" ")}")
    println(s"[lake] final rows=${t.scan().df.count()}")

    // Physical plan sanity: pruned scan should read only selected files and
    // push the residual predicate down to parquet.
    t.scan(convRange = Some(("c00000100", "c00000119"))).df.explain("formatted")

    spark.stop()
  }
}
