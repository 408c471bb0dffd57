package graft.maintain

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.{DataFile, IntervalDnf, LakeTable, MetaJson, Snapshot}

/** Row-level DELETE FROM: remove every row matching a predicate, rewriting
  * ONLY the data files that actually CONTAIN matching rows — the
  * reference's explicit delete (`files.py:68-76`, file-granular) lifted to
  * predicate semantics over the lakehouse, completing the DML surface
  * beside MERGE and the dedup pass.
  *
  * Scale shape, O(matching files) end to end:
  *   1. the predicate itself is analyzed into an interval DNF over
  *      (conv_id, turn_idx, ts) — [[IntervalDnf]] — and candidate files
  *      come from the SAME two-level metadata prune as scans: manifests
  *      whose persisted range misses every box are never OPENED. A
  *      row-retention predicate (`ts < timestamp_millis(...)`) prunes on
  *      the per-file event-time stats, so a daily tick plans only the
  *      files old enough to hold expired rows.
  *   2. ONE planning pass over the candidates counts matching rows PER
  *      FILE (reads only the predicate's columns); files with ZERO matches
  *      leave the plan entirely — they are never read again, never
  *      rewritten, their names never churn (and their sketch coverage
  *      survives). The per-file counts persist beside the ledger plan, so
  *      a resume reuses them.
  *   3. each ledger-checkpointed task group reads its files ONCE, keeps
  *      `NOT predicate` survivors, range-repartitions them (tight per-file
  *      stats, pruning survives the rewrite) and writes — no second
  *      counting scan; the expected survivor count is already known and
  *      cross-checked against the written files' stats. An all-deleted
  *      group writes nothing.
  *   4. the commit is a plain [[LakeTable.commitDelta]] removing only the
  *      files with victims: snapshot isolation, conflict detection and
  *      time travel apply as to every other operation.
  *
  * The predicate is SQL text (the natural `DELETE FROM t WHERE <pred>`
  * surface), persisted verbatim in the job plan AND the counts sidecar so
  * a resumed job provably re-applies the same condition; a resume with a
  * DIFFERENT predicate or range fails loudly. Optional `convRange`/
  * `turnRange` hints are VALIDATED against the predicate's own boxes — a
  * hint narrower than what the predicate can match would silently leave
  * matching rows alive, so it is rejected instead of trusted.
  */
object DeleteFrom {

  final case class Result(snapshot: Snapshot, deletedRows: Long,
                          touchedFiles: Int, carriedFiles: Long,
                          resumedGroups: Int,
                          candidateFiles: Long = 0L, totalFiles: Long = 0L,
                          prunedCandidateFiles: Long = 0L)

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

    val pred = expr(predSql)
    val totalFiles = snap0.manifests.map(_.entryCount).sum

    // ---- plan: predicate-derived pruning + per-file victim counts -------
    val (plan, counts) = Ledger.readPlan(table, jobId) match {
      case Some(p) =>
        require(p.kind == planKind,
          s"ledger plan for $jobId is '${p.kind}' but this invocation is " +
            s"'$planKind' — job-id collision or changed predicate; use a " +
            "fresh jobId")
        require(table.currentSnapshotId.contains(p.baseSnapshotId),
          s"stale plan for $jobId (base ${p.baseSnapshotId}, " +
            s"current ${table.currentSnapshotId})")
        val c = readCounts(table, jobId).getOrElse(throw new IllegalStateException(
          s"delete plan for $jobId exists but its victim counts are missing"))
        (p, c)
      case None =>
        // The prune boxes come from the PREDICATE — hints are validated,
        // never trusted: a hint that cannot contain every derived box means
        // the predicate may match outside it (a partial DELETE that would
        // look successful), so fail loudly instead.
        val boxes = IntervalDnf.extract(
          IntervalDnf.analyzedCondition(spark, table.schema.toStruct, predSql))
        convRange.foreach { case (lo, hi) =>
          require(boxes.forall(_.conv.within(lo, hi)),
            s"convRange hint [$lo..$hi] is narrower than what the predicate " +
              s"'$predSql' can match — a hinted DELETE must never silently " +
              "skip matching rows; drop the hint or widen it")
        }
        turnRange.foreach { case (lo, hi) =>
          require(boxes.forall(_.turn.within(lo, hi)),
            s"turnRange hint [$lo..$hi] is narrower than what the predicate " +
              s"'$predSql' can match; drop the hint or widen it")
        }
        val pruned = table.overlappingEntriesBoxes(snap0, boxes)
        // ONE pass over the candidates: matching rows per file. Catalyst
        // prunes the read to the predicate's columns; the result is
        // metadata-sized (one row per file WITH victims).
        val perFile: Map[String, Long] =
          if (pruned.entries.isEmpty) Map.empty
          else table.readData(pruned.entries.map(e => table.absData(e.file.path)))
            .where(coalesce(pred.cast("boolean"), lit(false)))
            .groupBy(concat(lit("data/"),
              element_at(split(input_file_name(), "/"), -1)).as("__src"))
            .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // counts sidecar FIRST, plan second: a plan on disk implies its
        // counts exist, so resume never trusts a half-planned job
        writeCounts(table, jobId, predSql, perFile,
          prunedCandidates = pruned.entries.size.toLong)
        val byPath = pruned.entries.map(e => e.file.path -> e.file).toMap
        val withVictims = perFile.keys.toVector.sorted.map(byPath(_))
        val groups = Clustering.greedyGroups(
          withVictims.sortBy(f => (f.minConv.getOrElse(""), f.minTurn.getOrElse(0))),
          groupTargetBytes).filter(_.nonEmpty)
        Ledger.writePlan(table, jobId, snap0.id, groups.map(_.map(_.path)),
          kind = planKind)
        (Ledger.readPlan(table, jobId).get, perFile)
    }
    if (plan.groups.isEmpty || plan.groups.forall(_.isEmpty)) {
      // predicate matched nothing: commit NOTHING — zero file churn
      Ledger.markCommitted(table, jobId, "delete", snap0.id)
      return Result(snap0, 0L, 0, totalFiles, 0,
        candidateFiles = 0L, totalFiles = totalFiles)
    }

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
          val victims = paths.map(counts.getOrElse(_, 0L)).sum
          val nSurv = rows - victims
          try {
            if (executedCount.getAndIncrement() >= interruptAfter)
              throw new InterruptedException(s"chaos interrupt after $interruptAfter groups")
            val out =
              if (nSurv == 0L) Vector.empty[DataFile]
              else {
                val nOut = math.max(1, math.ceil(nSurv.toDouble / targetFileRows).toInt)
                // survivors = NOT matching; null predicate results survive
                // too (SQL DELETE: only rows where the condition is TRUE
                // are deleted). Single scan — no separate count.
                table.writeDataFiles(
                  table.readData(paths.map(table.absData))
                    .where(!coalesce(pred.cast("boolean"), lit(false)))
                    .repartitionByRange(nOut, col("conv_id"), col("turn_idx"))
                    .sortWithinPartitions("conv_id", "turn_idx"),
                  s"$jobId-g$gi")
              }
            val written = out.map(_.rows).sum
            require(written == nSurv,
              s"DELETE group $gi wrote $written survivors but the plan " +
                s"counted $nSurv — non-deterministic predicate? refusing to commit")
            deletedRows.addAndGet(victims)
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

    // removed = ONLY the files with victims — everything else (files AND
    // manifests) carries forward untouched, names unchanged
    val removed = plan.groups.flatten.sorted.map(entryByPath(_))
    val nDeleted = deletedRows.get()
    val carried = totalFiles - removed.size
    val snap = table.commitDelta(outputs.flatten, removed, "delete",
      summary = Map("job_id" -> jobId,
        "predicate" -> predSql,
        "deleted_rows" -> nDeleted.toString,
        "touched_files" -> removed.size.toString))
    Ledger.markCommitted(table, jobId, "delete", snap.id)
    Result(snap, nDeleted, removed.size, carried, resumedCount.get(),
      candidateFiles = counts.size.toLong, totalFiles = totalFiles,
      prunedCandidateFiles = readPrunedCandidates(table, jobId)
        .getOrElse(counts.size.toLong))
  }

  /** The predicate a previously PLANNED (possibly crashed) invocation of
    * `jobId` pinned — so retry paths (e.g. a re-run maintenance cycle whose
    * default `nowMs` moved) can replay the exact original condition instead
    * of tripping the changed-predicate guard.
    */
  def plannedPredicate(table: LakeTable, jobId: String): Option[String] = {
    val p = table.ledgerDir.resolve(jobId).resolve("delete-victims.json")
    if (!Files.exists(p)) None
    else Some(MetaJson.read(Files.readString(p)).get("predicate").asText)
  }

  // ---- per-file victim counts sidecar (atomic, beside the ledger plan) --

  private def writeCounts(table: LakeTable, jobId: String, predSql: String,
                          counts: Map[String, Long],
                          prunedCandidates: Long): Unit = {
    val o = MetaJson.mapper.createObjectNode()
    o.put("predicate", predSql)
    // the stats-prune candidate set (files the counting pass had to SCAN)
    // is recorded beside the matching-file counts: candidateFiles alone
    // (files that CONTAIN victims) overstated prune effectiveness in the
    // bench report and hid the clean-file scan cost
    o.put("pruned_candidates", prunedCandidates)
    val c = o.putObject("counts")
    counts.toSeq.sortBy(_._1).foreach { case (k, v) => c.put(k, v) }
    val dir = table.ledgerDir.resolve(jobId)
    Files.createDirectories(dir)
    val tmp = dir.resolve("delete-victims.json.tmp")
    Files.writeString(tmp, MetaJson.write(o))
    Files.move(tmp, dir.resolve("delete-victims.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def readPrunedCandidates(table: LakeTable, jobId: String): Option[Long] = {
    val p = table.ledgerDir.resolve(jobId).resolve("delete-victims.json")
    if (!Files.exists(p)) None
    else Option(MetaJson.read(Files.readString(p)).get("pruned_candidates"))
      .map(_.asLong)
  }

  private def readCounts(table: LakeTable, jobId: String): Option[Map[String, Long]] = {
    val p = table.ledgerDir.resolve(jobId).resolve("delete-victims.json")
    if (!Files.exists(p)) None
    else {
      val n = MetaJson.read(Files.readString(p)).get("counts")
      val it = n.fields()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asLong }
      Some(b.result())
    }
  }
}
