package graft.maintain

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.lake.LakeTable

/** Snapshot expiry + physical GC — the reference's retention cleanup
  * (cleanup.py:16-54: cutoff = now - retention, scan-and-delete with
  * per-file error isolation, :43-46) lifted to table versions: expired
  * snapshots' metadata is removed and any data/manifest file no retained
  * snapshot references is deleted. The CURRENT snapshot is always retained,
  * so readers pinned to it are never broken; readers pinned to an expired
  * snapshot lose reproducibility only after its retention lapses — exactly
  * the reference's 24h contract.
  */
object Expire {

  final case class Result(
      expiredSnapshots: Vector[Long],
      deletedDataFiles: Vector[String],
      deletedMetaFiles: Vector[String],
      failures: Vector[String])

  def expire(table: LakeTable,
             retainLast: Int = 2,
             olderThanMs: Option[Long] = None,
             nowMs: Long = System.currentTimeMillis()): Result = {
    val currentId = table.currentSnapshotId.get
    // COMMITTED snapshots only (id <= pointer): a not-yet-adopted orphan of
    // a crashed commit must never be expired here — a retainLast=0 +
    // olderThanMs=None call would otherwise delete a fresh orphan that a
    // concurrent commit is about to adopt, leaving the pointer on a missing
    // snapshot. Orphans are OrphanGc's job, behind its adoption age guard.
    val snaps = table.allSnapshotsTolerant.filter(_.id <= currentId)

    val newestFirst = snaps.sortBy(-_.id)
    // `olderThanMs` is an AGE (the reference's retention duration,
    // cleanup.py cutoff = now - retention). Iceberg-style semantics: a
    // snapshot is retained while YOUNGER than the age OR among the newest
    // retainLast — expiry needs both "old enough" and "beyond the floor",
    // so a reader pinned inside the retention window is never broken early.
    val retained = newestFirst.zipWithIndex.filter { case (s, idx) =>
      s.id == currentId ||
        idx < retainLast ||
        olderThanMs.exists(age => s.timestampMs >= nowMs - age)
    }.map(_._1)
    val expired = snaps.filterNot(s => retained.exists(_.id == s.id))
    if (expired.isEmpty)
      return Result(Vector.empty, Vector.empty, Vector.empty, Vector.empty)

    val failures = Vector.newBuilder[String]

    // Manifests are shared across snapshots (commitDelta carry-forward):
    // each manifest is parsed at most ONCE — retained ones for the keep
    // set, expired-ONLY ones for drop candidates (files in a shared
    // manifest are kept wholesale, no need to open it twice).
    //
    // READ isolation, not just delete isolation: a PRIOR expire may have
    // deleted a manifest but failed on its snap-*.json (tolerated below) —
    // the still-listed snapshot then references a missing manifest. Treat
    // ONLY NoSuchFile as "already gone, nothing to keep/drop through it"
    // (and re-attempt the dangling snap delete); any other read error still
    // aborts — an IO hiccup must not silently shrink the keep set and let
    // live data be swept.
    val keepManifests = retained.flatMap(_.manifestPaths).toSet
    val keepData = tolerantDataPaths(table, keepManifests.toSeq, failures).toSet
    val dropManifests = expired.flatMap(_.manifestPaths)
      .distinct.filterNot(keepManifests)
    val dropData = tolerantDataPaths(table, dropManifests, failures)
      .distinct.filterNot(keepData)
    val deletedData = Vector.newBuilder[String]
    val deletedMeta = Vector.newBuilder[String]

    // Per-file error isolation: one failed delete must not abort the sweep
    // (reference cleanup.py:43-46 "skip failures, keep going").
    def tryDelete(abs: java.nio.file.Path, label: String): Boolean =
      try Files.deleteIfExists(abs)
      catch { case e: Exception => failures += s"$label: ${e.getMessage}"; false }

    dropData.foreach { rel =>
      if (tryDelete(Paths.get(table.absData(rel)), rel)) deletedData += rel
    }
    dropManifests.foreach { rel =>
      if (tryDelete(Paths.get(table.root, "metadata", rel), rel)) deletedMeta += rel
    }
    expired.foreach { s =>
      val rel = s"snap-${s.id}.json"
      if (tryDelete(Paths.get(table.root, "metadata", rel), rel)) deletedMeta += rel
    }

    Result(expired.map(_.id), deletedData.result(), deletedMeta.result(), failures.result())
  }

  /** [[LakeTable.dataPathsOf]] with per-manifest NoSuchFile tolerance (each
    * manifest still parsed once); other exceptions propagate — see the
    * caller's rationale.
    */
  private[maintain] def tolerantDataPaths(
      table: LakeTable, manifestPaths: Seq[String],
      failures: scala.collection.mutable.Builder[String, Vector[String]]): Vector[String] =
    tolerantEntries(table, manifestPaths, failures).map(_.path)

  /** Full entries variant (paths + sketch-batch refs), same tolerance. */
  private[maintain] def tolerantEntries(
      table: LakeTable, manifestPaths: Seq[String],
      failures: scala.collection.mutable.Builder[String, Vector[String]]): Vector[graft.lake.DataFile] =
    manifestPaths.distinct.toVector.flatMap { p =>
      try table.manifest(p).entries
      catch {
        case e: java.nio.file.NoSuchFileException =>
          failures += s"$p: missing (skipped): ${e.getMessage}"
          Vector.empty
      }
    }
}

/** Orphan-file GC: data AND metadata files on disk referenced by NO
  * snapshot — the residue of write attempts that crashed before their
  * commit (data-file and manifest names are unique per attempt precisely so
  * a retry cannot overwrite, which means the failed attempt's files
  * linger). Mirrors Iceberg's remove_orphan_files: only files older than
  * `olderThanMs` are candidates, so an in-flight writer's
  * staged-but-uncommitted output is never swept.
  *
  * Sweep ORDER matters: metadata first. An orphan snap-*.json beyond the
  * version pointer (a crashed commit that was never adopted — see
  * [[graft.lake.LakeTable]]'s crash-orphan recovery) is deleted once past
  * BOTH the grace age and `adoptGuardMs`; only THEN do its manifests and
  * data files become unreferenced and sweepable. `adoptGuardMs` (default
  * 2 x [[graft.lake.LakeTable.OrphanAdoptMaxAgeMs]]) is the no-adoption-race
  * guarantee: commit-time recovery only ADOPTS orphans younger than half
  * this bound (and supersedes older ones itself), so by the time this sweep
  * may delete an orphan snap, no adopter can still be about to swing the
  * pointer to it — deleting the file out from under an in-flight adoption
  * would leave the pointer referencing a missing snapshot, bricking the
  * table. Tests pass 0 to simulate a post-grace sweep directly.
  */
object OrphanGc {

  final case class Result(deleted: Vector[String], failures: Vector[String],
                          deletedMeta: Vector[String] = Vector.empty)

  def removeOrphans(table: LakeTable,
                    olderThanMs: Long,
                    nowMs: Long = System.currentTimeMillis(),
                    adoptGuardMs: Long = 2 * LakeTable.OrphanAdoptMaxAgeMs): Result = {
    val deleted = Vector.newBuilder[String]
    val deletedMeta = Vector.newBuilder[String]
    val failures = Vector.newBuilder[String]
    val metaDir = Paths.get(table.root, "metadata")
    def oldEnough(p: java.nio.file.Path): Boolean =
      Files.getLastModifiedTime(p).toMillis < nowMs - olderThanMs

    // ---- metadata sweep --------------------------------------------------
    // 1. orphan snapshots: snap files beyond the pointer, past grace AND
    // past the adoption guard (see the object docstring)
    val pointer = table.currentSnapshotId.getOrElse(-1L)
    def pastAdoptGuard(p: java.nio.file.Path): Boolean =
      Files.getLastModifiedTime(p).toMillis < nowMs - adoptGuardMs
    table.allSnapshotIds.filter(_ > pointer).foreach { id =>
      val p = metaDir.resolve(s"snap-$id.json")
      try if (Files.exists(p) && oldEnough(p) && pastAdoptGuard(p)) {
        Files.deleteIfExists(p); deletedMeta += s"snap-$id.json"
      } catch { case e: Exception => failures += s"snap-$id.json: ${e.getMessage}" }
    }
    // 2. manifests referenced by NO remaining snapshot, past grace.
    // ONE metadata parse serves both this sweep and the data sweep below
    // (nothing between them deletes snapshots).
    val remaining = table.allSnapshotsTolerant
    val liveManifests = remaining.flatMap(_.manifestPaths).toSet
    if (Files.exists(metaDir)) LakeTable.listDir(metaDir).foreach { p =>
      val n = p.getFileName.toString
      val sweepable = n.startsWith("manifest-") && n.endsWith(".json") ||
        n.startsWith("version-hint.tmp-") || n.startsWith("version-hint.adopt-") ||
        n.contains(".json.superseded-") // quarantined stale-orphan snapshots
      if (sweepable && !liveManifests(n)) {
        try if (oldEnough(p)) { Files.deleteIfExists(p); deletedMeta += n }
        catch { case e: Exception => failures += s"$n: ${e.getMessage}" }
      }
    }

    // ---- data sweep ------------------------------------------------------
    // Referenced = every REMAINING snapshot's data files PLUS every
    // ledger-checkpointed task output: an interrupted job's finished groups
    // live only in the ledger until the final commit — sweeping them would
    // make the resumed job publish a snapshot over deleted files.
    // (Manifests are SHARED across snapshots; each parses once. A manifest
    // a prior half-failed expire already removed reads as empty — only
    // NoSuchFile is tolerated, an IO error must not shrink the set.)
    val remainingEntries =
      Expire.tolerantEntries(table, remaining.flatMap(_.manifestPaths), failures)
    val ledgerOut = Ledger.allTaskRows(table).flatMap(_.outFiles)
    val referenced = remainingEntries.map(_.path).toSet ++ ledgerOut.map(_.path)
    val dataDir = Paths.get(table.root, "data")
    if (Files.exists(dataDir)) {
      val stream = Files.list(dataDir)
      try stream.iterator().asScala.foreach { p =>
        val rel = s"data/${p.getFileName}"
        if (!referenced(rel) && oldEnough(p)) {
          try { Files.deleteIfExists(p); deleted += rel }
          catch { case e: Exception => failures += s"$rel: ${e.getMessage}" }
        }
      } finally stream.close()
    }

    // ---- sketch sweep ----------------------------------------------------
    // a batch dir stays while ANY snapshot entry or ledger checkpoint
    // still points at it; past that it is dead weight
    val referencedBatches =
      (remainingEntries.flatMap(_.sketch) ++ ledgerOut.flatMap(_.sketch)).toSet
    Sketches.sweepOrphans(table, referencedBatches, oldEnough, deletedMeta, failures)

    Result(deleted.result(), failures.result(), deletedMeta.result())
  }
}

/** Manifest rewrite: regroup the current snapshot's (unchanged) data files
  * into range-sorted manifests of bounded size. Pure metadata operation —
  * no data moves — keeping planning cost bounded as file counts grow.
  */
object ManifestRewrite {
  def rewrite(table: LakeTable, entriesPerManifest: Int = 1000): graft.lake.Snapshot =
    table.commit(table.currentFiles, "rewrite-manifests",
      summary = Map("entries_per_manifest" -> entriesPerManifest.toString),
      entriesPerManifest = entriesPerManifest)
}
