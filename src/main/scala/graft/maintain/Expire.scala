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
    val snaps = table.allSnapshots
    val currentId = table.currentSnapshotId.get

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

    // Manifests are shared across snapshots (commitDelta carry-forward):
    // each manifest is parsed at most ONCE — retained ones for the keep
    // set, expired-ONLY ones for drop candidates (files in a shared
    // manifest are kept wholesale, no need to open it twice).
    val keepManifests = retained.flatMap(_.manifestPaths).toSet
    val keepData = table.dataPathsOf(keepManifests.toSeq).toSet
    val dropManifests = expired.flatMap(_.manifestPaths)
      .distinct.filterNot(keepManifests)
    val dropData = table.dataPathsOf(dropManifests)
      .distinct.filterNot(keepData)

    val failures = Vector.newBuilder[String]
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
}

/** Orphan-file GC: data files on disk referenced by NO snapshot — the
  * residue of write attempts that crashed before their commit (data-file
  * names are unique per attempt precisely so a retry cannot overwrite, which
  * means the failed attempt's files linger). Mirrors Iceberg's
  * remove_orphan_files: only files older than `olderThanMs` are candidates,
  * so an in-flight writer's staged-but-uncommitted output is never swept.
  */
object OrphanGc {

  final case class Result(deleted: Vector[String], failures: Vector[String])

  def removeOrphans(table: LakeTable,
                    olderThanMs: Long,
                    nowMs: Long = System.currentTimeMillis()): Result = {
    // Referenced = every snapshot's data files PLUS every ledger-checkpointed
    // task output: an interrupted job's finished groups live only in the
    // ledger until the final commit — sweeping them would make the resumed
    // job publish a snapshot over deleted files. (Manifests are SHARED
    // across snapshots; dataPathsOf parses each one once.)
    val referenced =
      table.dataPathsOf(table.allSnapshots.flatMap(_.manifestPaths)).toSet ++
        Ledger.allTaskRows(table).flatMap(_.outFiles.map(_.path))
    val dataDir = Paths.get(table.root, "data")
    val deleted = Vector.newBuilder[String]
    val failures = Vector.newBuilder[String]
    if (Files.exists(dataDir)) {
      val stream = Files.list(dataDir)
      try stream.iterator().asScala.foreach { p =>
        val rel = s"data/${p.getFileName}"
        val oldEnough = Files.getLastModifiedTime(p).toMillis < nowMs - olderThanMs
        if (!referenced(rel) && oldEnough) {
          try { Files.deleteIfExists(p); deleted += rel }
          catch { case e: Exception => failures += s"$rel: ${e.getMessage}" }
        }
      } finally stream.close()
    }
    Result(deleted.result(), failures.result())
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
