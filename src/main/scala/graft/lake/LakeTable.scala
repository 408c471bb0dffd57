package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** The lakehouse table: immutable Parquet data files + versioned JSON
  * metadata, with snapshot-isolated reads and stats-pruned scans.
  *
  * Layout under `root`:
  * {{{
  *   data/<uuid>-<n>.parquet        immutable data files
  *   metadata/snap-<id>.json        snapshots (schema + manifest list)
  *   metadata/manifest-<id>-<k>.json manifests (DataFile entries)
  *   metadata/version-hint.txt      current snapshot id (atomic pointer)
  *   _ledger/<job>/...              maintenance checkpoint ledger
  * }}}
  *
  * Commit protocol (single maintenance writer, like the reference's single
  * APScheduler job, main.py:40-46): write all manifests + the snapshot JSON
  * first (new files, never overwritten), then atomically move a temp
  * version-hint over the pointer. Readers resolve the pointer once and pin
  * that snapshot — maintenance committing S+1 never disturbs a reader of S
  * (immutable files + versioned metadata = snapshot isolation).
  */
class LakeTable(val root: String, val spark: SparkSession) {
  import LakeTable._

  private def metaDir = Paths.get(root, "metadata")
  private def dataDir = Paths.get(root, "data")
  def ledgerDir: Path = Paths.get(root, "_ledger")

  // ---- snapshot access -------------------------------------------------

  def currentSnapshotId: Option[Long] = {
    val hint = metaDir.resolve("version-hint.txt")
    if (Files.exists(hint)) Some(Files.readString(hint).trim.toLong) else None
  }

  def snapshot(id: Long): Snapshot =
    MetaJson.snapshotFromJson(MetaJson.read(
      Files.readString(metaDir.resolve(s"snap-$id.json"))))

  def currentSnapshot: Option[Snapshot] = currentSnapshotId.map(snapshot)

  def allSnapshots: Vector[Snapshot] =
    Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("snap-").stripSuffix(".json").toLong)
      .toVector.sorted.map(snapshot)

  def manifest(path: String): Manifest =
    MetaJson.manifestFromJson(path, MetaJson.read(
      Files.readString(metaDir.resolve(path))))

  def dataFiles(s: Snapshot): Vector[DataFile] =
    s.manifestPaths.flatMap(p => manifest(p).entries)

  def currentFiles: Vector[DataFile] = currentSnapshot.map(dataFiles).getOrElse(Vector.empty)

  def schema: TableSchema = currentSnapshot.map(_.schema).getOrElse(
    throw new IllegalStateException(s"table at $root has no snapshot"))

  def absData(rel: String): String = Paths.get(root, rel).toString

  // ---- scan with manifest pruning ---------------------------------------

  final case class PruneStats(totalFiles: Long, selectedFiles: Long) {
    def ratio: Double = if (totalFiles == 0) 0.0 else 1.0 - selectedFiles.toDouble / totalFiles
  }

  final case class Scan(df: DataFrame, prune: PruneStats)

  /** Read a snapshot (default current) pruned by optional conv_id /
    * turn_idx ranges. Pruning happens at the METADATA level — unselected
    * files never reach `spark.read` — and the residual predicate is still
    * applied (and pushed into the Parquet row-group filter by Catalyst).
    */
  def scan(convRange: Option[(String, String)] = None,
           turnRange: Option[(Int, Int)] = None,
           snapshotId: Option[Long] = None): Scan = {
    val snap = snapshotId.map(snapshot).orElse(currentSnapshot)
      .getOrElse(throw new IllegalStateException("no snapshot to scan"))
    val files = dataFiles(snap)
    val selected = files.filter { f =>
      convRange.forall { case (lo, hi) => f.overlapsConv(lo, hi) } &&
      turnRange.forall { case (lo, hi) => f.overlapsTurn(lo, hi) }
    }
    val st = snap.schema.toStruct
    val base =
      if (selected.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), st)
      else spark.read.schema(st).parquet(selected.map(f => absData(f.path)): _*)
    val filtered = Seq(
      convRange.map { case (lo, hi) => col("conv_id").between(lo, hi) },
      turnRange.map { case (lo, hi) => col("turn_idx").between(lo, hi) }
    ).flatten.foldLeft(base)((d, p) => d.where(p))
    Scan(filtered, PruneStats(files.size.toLong, selected.size.toLong))
  }

  /** Stable user-facing read: current snapshot ordered by the table key. */
  def readOrdered(): DataFrame =
    scan().df.orderBy("conv_id", "turn_idx")

  // ---- writes ------------------------------------------------------------

  /** Write `df` (already in table-schema column order) as data files and
    * return their entries with footer-derived stats. The data lands under
    * data/ with unique names; nothing is committed yet.
    */
  def writeDataFiles(df: DataFrame, tag: String): Vector[DataFile] = {
    val staging = Paths.get(root, s"_staging-$tag")
    // zstd: ~2x smaller files than snappy for this text-heavy schema —
    // scans read fewer bytes and maintenance I/O shifts toward CPU, which
    // scales with executors while disks don't.
    df.write.mode("overwrite").option("compression", "zstd").parquet(staging.toString)
    Files.createDirectories(dataDir)
    val conf = spark.sessionState.newHadoopConf()
    val parts = Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toVector.sortBy(_.toString)
    // Footer reads are independent metadata fetches — do them concurrently.
    val entries = graft.maintain.Parallel.mapInParallel(parts.zipWithIndex, 16) {
      case (p, i) =>
        val rel = s"data/$tag-$i.parquet"
        val target = Paths.get(root, rel)
        Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
        val st = ParquetStats.read(target.toString, conf)
        DataFile(rel, st.rows, Files.size(target),
          st.minConv, st.maxConv, st.minTurn, st.maxTurn)
    }
    deleteRecursively(staging)
    entries
  }

  /** Plain append: write `df` (must match the table schema) as new files
    * alongside the existing ones. Used for initial loads and drop batches
    * that are known key-disjoint; overlapping keys belong to MERGE.
    */
  def append(df: DataFrame, tag: String): Snapshot = {
    val entries = writeDataFiles(
      df.select(schema.fieldNames.map(n => col(s"`$n`")): _*), tag)
    commit(currentFiles ++ entries, "append",
      summary = Map("append_tag" -> tag))
  }

  /** Commit a new snapshot: entries grouped into manifests, snapshot JSON,
    * then the atomic version-hint move.
    */
  def commit(newFiles: Vector[DataFile], operation: String,
             newSchema: Option[TableSchema] = None,
             summary: Map[String, String] = Map.empty,
             entriesPerManifest: Int = DefaultEntriesPerManifest): Snapshot = {
    Files.createDirectories(metaDir)
    val parent = currentSnapshot
    val id = parent.map(_.id + 1).getOrElse(1L)
    val seq = parent.map(_.sequence + 1).getOrElse(1L)
    val sch = newSchema.orElse(parent.map(_.schema)).getOrElse(
      throw new IllegalStateException("first commit must provide a schema"))

    // Manifests grouped by key range (sorted by min conv/turn) so future
    // planning can skip whole manifests.
    val sorted = newFiles.sortBy(f => (f.minConv.getOrElse(""), f.minTurn.getOrElse(0)))
    val manifests = sorted.grouped(entriesPerManifest).zipWithIndex.map {
      case (group, k) =>
        val rel = s"manifest-$id-$k.json"
        writeString(metaDir.resolve(rel),
          MetaJson.write(MetaJson.manifestToJson(Manifest(rel, group.toVector))))
        rel
    }.toVector

    val snap = Snapshot(id, parent.map(_.id).getOrElse(-1L), seq,
      System.currentTimeMillis(), operation, sch, manifests,
      summary ++ Map("total_files" -> newFiles.size.toString,
        "total_rows" -> newFiles.map(_.rows).sum.toString))
    writeString(metaDir.resolve(s"snap-$id.json"),
      MetaJson.write(MetaJson.snapshotToJson(snap)))

    // Atomic pointer swing — the only mutation in the whole protocol.
    val tmp = metaDir.resolve(s"version-hint.tmp-$id")
    writeString(tmp, id.toString)
    Files.move(tmp, metaDir.resolve("version-hint.txt"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    snap
  }
}

object LakeTable {
  val DefaultEntriesPerManifest = 1000

  def create(spark: SparkSession, root: String, schema: StructType): LakeTable = {
    val t = new LakeTable(root, spark)
    Files.createDirectories(Paths.get(root, "metadata"))
    Files.createDirectories(Paths.get(root, "data"))
    t.commit(Vector.empty, "create", Some(TableSchema.fromStruct(schema)))
    t
  }

  def load(spark: SparkSession, root: String): LakeTable = {
    val t = new LakeTable(root, spark)
    require(t.currentSnapshotId.isDefined, s"no table at $root")
    t
  }

  private[lake] def writeString(p: Path, s: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, s.getBytes(StandardCharsets.UTF_8))
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toVector.reverse.foreach(Files.deleteIfExists(_))
    }
  }
}
