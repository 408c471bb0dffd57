package graft.maintain

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.lake.{DataFile, LakeTable, Snapshot}

/** Bin-packing small-file compaction: files below `smallFileBytes` are
  * packed first-fit-decreasing into ~targetBytes bins; each bin is read,
  * re-sorted on the cluster key and rewritten as ONE file — a pure
  * coalesce, NO shuffle (the expensive global ordering work belongs to
  * [[Clustering]], not here). Each bin checkpoints to the ledger, so a
  * restarted job skips finished bins.
  */
object Compaction {

  final case class Result(snapshot: Option[Snapshot], bins: Int, resumedBins: Int,
                          filesCompacted: Int)

  /** `excludePaths`: files never considered for packing even when small —
    * [[Maintenance.runCycle]] passes the last cluster commit's file set so
    * compaction only packs NEW drop debris, not freshly clustered slabs
    * (re-packing those would dirty every slab and force the next recluster
    * to be full instead of incremental).
    */
  def compact(table: LakeTable, jobId: String,
              smallFileBytes: Long = 32L << 20,
              targetBytes: Long = 128L << 20,
              excludePaths: Set[String] = Set.empty): Result = {
    val spark = table.spark

    // operation-scoped idempotence: only a COMPACT snapshot with this job
    // id short-circuits (see the matching guard in Clustering). O(1) ledger
    // marker, not a full-history walk.
    Ledger.committedJobSnapshot(table, jobId, "compact").foreach { s =>
      return Result(Some(s), 0, 0, 0)
    }

    val plannedBins = Ledger.readPlan(table, jobId) match {
      case Some(p) =>
        require(p.kind.isEmpty || p.kind == "compact",
          s"ledger id collision: plan for $jobId belongs to a '${p.kind}' job")
        require(table.currentSnapshotId.contains(p.baseSnapshotId),
          s"stale compaction plan for $jobId (base ${p.baseSnapshotId})")
        p.groups
      case None =>
        val small = table.currentFiles.filter(f =>
          f.bytes < smallFileBytes && !excludePaths(f.path))
        val bins = firstFitDecreasing(small, targetBytes)
          .filter(_.size > 1) // a lone small file gains nothing from rewrite
          .map(_.map(_.path))
        Ledger.writePlan(table, jobId, table.currentSnapshotId.get, bins, kind = "compact")
        bins
    }

    if (plannedBins.isEmpty) return Result(None, 0, 0, 0)

    val entryByPath = table.currentEntries.map(e => e.file.path -> e).toMap
    val byPath = (p: String) => entryByPath(p).file
    val done = Ledger.readTasks(table, jobId).filter(_._2.state == "done")
    val resumedCount = new java.util.concurrent.atomic.AtomicInteger(0)

    // Bins are single-task coalesce jobs: submit them CONCURRENTLY so they
    // fill the executors instead of running one task at a time.
    val outputs = Parallel.mapInParallel(plannedBins.zipWithIndex,
      parallelism = spark.sparkContext.defaultParallelism) {
      case (paths, bi) =>
        done.get(bi) match {
          case Some(t) => resumedCount.incrementAndGet(); t.outFiles
          case None =>
            val t0 = System.nanoTime()
            val inFiles = paths.map(byPath(_))
            try {
              val df = table.readData(paths.map(table.absData))
                .coalesce(1) // merge partitions without shuffling
                .sortWithinPartitions(col("conv_id"), col("turn_idx"))
              val out = table.writeDataFiles(df, s"$jobId-b$bi")
              Ledger.writeTask(table, Ledger.TaskRow(jobId, bi, "done", paths, out,
                inFiles.map(_.rows).sum, inFiles.map(_.bytes).sum,
                (System.nanoTime() - t0) / 1000000))
              out
            } catch { case e: Throwable =>
              // Failed tasks leave an `error` row (reference parity:
              // file_repository.py:95-109 pending->processed/error with
              // error_message); resume recomputes them.
              Ledger.writeTask(table, Ledger.TaskRow(jobId, bi, "error", paths,
                Vector.empty, inFiles.map(_.rows).sum, inFiles.map(_.bytes).sum,
                (System.nanoTime() - t0) / 1000000,
                errorMessage = String.valueOf(e.getMessage)))
              throw e
            }
        }
    }
    val resumed = resumedCount.get()

    val inputSet = plannedBins.flatten.toSet
    val removed = inputSet.toVector.sorted.map(entryByPath(_))
    val snap = table.commitDelta(outputs.flatten, removed, "compact",
      summary = Map("job_id" -> jobId,
        "bins" -> plannedBins.size.toString,
        "files_compacted" -> inputSet.size.toString))
    Ledger.markCommitted(table, jobId, "compact", snap.id)
    Result(Some(snap), plannedBins.size, resumed, inputSet.size)
  }

  /** Classic FFD: sort descending by size, place each file into the first
    * bin with room, open a new bin otherwise.
    */
  def firstFitDecreasing(files: Vector[DataFile], targetBytes: Long): Vector[Vector[DataFile]] = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, scala.collection.mutable.ArrayBuffer[DataFile])]
    files.sortBy(-_.bytes).foreach { f =>
      bins.indexWhere(_._1 + f.bytes <= targetBytes) match {
        case -1 => bins += ((f.bytes, scala.collection.mutable.ArrayBuffer(f)))
        case i => val (sz, buf) = bins(i); buf += f; bins(i) = (sz + f.bytes, buf)
      }
    }
    bins.map(_._2.toVector).toVector
  }
}
