package graft.maintain

import org.apache.spark.sql.functions._

import graft.lake.{DataFile, LakeTable, Snapshot}

/** Row-level DELETE FROM: remove every row matching a predicate, rewriting
  * ONLY the data files the predicate can touch — the reference's explicit
  * delete (`files.py:68-76`, file-granular) lifted to predicate semantics
  * over the lakehouse, completing the DML surface beside MERGE and the
  * dedup pass.
  *
  * Scale shape: the optional `convRange`/`turnRange` hints drive the SAME
  * two-level metadata pruning as scans — manifests whose persisted range
  * misses the hint are never OPENED, and non-overlapping files carry
  * forward (files AND manifests) without being read. Each ledger-
  * checkpointed task group reads its files once, keeps `NOT predicate`
  * survivors, range-repartitions them (tight per-file stats, pruning
  * survives the rewrite) and writes; an all-deleted group writes nothing.
  * The commit is a plain [[LakeTable.commitDelta]]: snapshot isolation,
  * conflict detection and time travel apply as to every other operation.
  *
  * The predicate is SQL text (the natural `DELETE FROM t WHERE <pred>`
  * surface, parsed with `expr`), persisted verbatim in the job plan so a
  * resumed job provably re-applies the same condition; a resume with a
  * DIFFERENT predicate or range fails loudly.
  */
object DeleteFrom {

  final case class Result(snapshot: Snapshot, deletedRows: Long,
                          touchedFiles: Int, carriedFiles: Long,
                          resumedGroups: Int)

  def run(table: LakeTable, jobId: String,
          predicateSql: String,
          convRange: Option[(String, String)] = None,
          turnRange: Option[(Int, Int)] = None,
          targetFileRows: Long = 1L << 20,
          groupTargetBytes: Long = 256L << 20,
          interruptAfter: Int = Int.MaxValue): Result = {
    val spark = table.spark
    val predSql = predicateSql.trim
    require(predSql.nonEmpty, "DELETE FROM needs a predicate")
    val planKind = "delete:" + predSql +
      convRange.map(r => s"|conv:${r._1}..${r._2}").getOrElse("") +
      turnRange.map(r => s"|turn:${r._1}..${r._2}").getOrElse("")

    Ledger.committedJobSnapshot(table, jobId, "delete").foreach { s =>
      return Result(s, 0L, 0, 0L, 0)
    }
    val snap0 = table.currentSnapshot.getOrElse(
      throw new IllegalStateException(s"no table at ${table.root}"))
    if (table.currentFiles.isEmpty)
      return Result(snap0, 0L, 0, 0L, 0)

    // ---- plan: two-level metadata pruning selects the candidate files ---
    val plan = Ledger.readPlan(table, jobId) match {
      case Some(p) =>
        require(p.kind == planKind,
          s"ledger plan for $jobId is '${p.kind}' but this invocation is " +
            s"'$planKind' — job-id collision or changed predicate; use a " +
            "fresh jobId")
        require(table.currentSnapshotId.contains(p.baseSnapshotId),
          s"stale plan for $jobId (base ${p.baseSnapshotId}, " +
            s"current ${table.currentSnapshotId})")
        p
      case None =>
        val pruned = table.overlappingEntries(snap0, convRange, turnRange)
        val candidates = pruned.entries.map(_.file)
        val groups = Clustering.greedyGroups(
          candidates.sortBy(f => (f.minConv.getOrElse(""), f.minTurn.getOrElse(0))),
          groupTargetBytes).filter(_.nonEmpty)
        Ledger.writePlan(table, jobId, snap0.id, groups.map(_.map(_.path)),
          kind = planKind)
        Ledger.readPlan(table, jobId).get
    }
    if (plan.groups.isEmpty || plan.groups.forall(_.isEmpty)) {
      Ledger.markCommitted(table, jobId, "delete", snap0.id)
      return Result(snap0, 0L, 0, snap0.manifests.map(_.entryCount).sum, 0)
    }

    val pred = expr(predSql)
    val entryByPath = table.currentEntries.map(e => e.file.path -> e).toMap
    val done = Ledger.readTasks(table, jobId).filter(_._2.state == "done")
    val resumedCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val executedCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val deletedRows = new java.util.concurrent.atomic.AtomicLong(0L)

    def runGroup(paths: Vector[String], gi: Int): Vector[DataFile] =
      done.get(gi) match {
        case Some(t) =>
          resumedCount.incrementAndGet()
          deletedRows.addAndGet(t.rows - t.outFiles.map(_.rows).sum)
          t.outFiles
        case None =>
          val t0 = System.nanoTime()
          val inFiles = paths.map(entryByPath(_).file)
          val rows = inFiles.map(_.rows).sum
          val bytes = inFiles.map(_.bytes).sum
          try {
            if (executedCount.getAndIncrement() >= interruptAfter)
              throw new InterruptedException(s"chaos interrupt after $interruptAfter groups")
            // survivors = NOT matching; null predicate results survive too
            // (SQL DELETE semantics: only rows where the condition is TRUE
            // are deleted)
            val survivors = spark.read.schema(table.schema.toStruct)
              .parquet(paths.map(table.absData): _*)
              .where(!coalesce(pred.cast("boolean"), lit(false)))
            val nSurv = survivors.count()
            val out =
              if (nSurv == 0L) Vector.empty[DataFile]
              else {
                val nOut = math.max(1, math.ceil(nSurv.toDouble / targetFileRows).toInt)
                table.writeDataFiles(
                  survivors
                    .repartitionByRange(nOut, col("conv_id"), col("turn_idx"))
                    .sortWithinPartitions("conv_id", "turn_idx"),
                  s"$jobId-g$gi")
              }
            deletedRows.addAndGet(rows - nSurv)
            Ledger.writeTask(table, Ledger.TaskRow(jobId, gi, "done", paths,
              out, rows, bytes, (System.nanoTime() - t0) / 1000000))
            out
          } catch { case e: Throwable =>
            Ledger.writeTask(table, Ledger.TaskRow(jobId, gi, "error", paths,
              Vector.empty, rows, bytes, (System.nanoTime() - t0) / 1000000,
              errorMessage = String.valueOf(e.getMessage)))
            throw e
          }
      }

    val indexed = plan.groups.zipWithIndex
    val outputs =
      if (interruptAfter != Int.MaxValue) indexed.map { case (p, gi) => runGroup(p, gi) }
      else Parallel.mapInParallel(indexed,
        parallelism = math.max(2, spark.sparkContext.defaultParallelism / 8)) {
        case (p, gi) => runGroup(p, gi)
      }

    val removed = plan.groups.flatten.sorted.map(entryByPath(_))
    val nDeleted = deletedRows.get()
    if (nDeleted == 0L) {
      // predicate matched nothing in the candidate files: commit NOTHING
      // (the rewritten-but-identical outputs would churn file names for
      // zero semantic change); orphaned write-attempt files are GC's
      val cur = table.currentSnapshot.get
      Ledger.markCommitted(table, jobId, "delete", cur.id)
      return Result(cur, 0L, 0, cur.manifests.map(_.entryCount).sum, resumedCount.get())
    }
    val carried = snap0.manifests.map(_.entryCount).sum - removed.size
    val snap = table.commitDelta(outputs.flatten, removed, "delete",
      summary = Map("job_id" -> jobId,
        "predicate" -> predSql,
        "deleted_rows" -> nDeleted.toString,
        "touched_files" -> removed.size.toString))
    Ledger.markCommitted(table, jobId, "delete", snap.id)
    Result(snap, nDeleted, removed.size, carried, resumedCount.get())
  }
}
