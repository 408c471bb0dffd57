package graft.maintain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.storage.StorageLevel

import graft.ingest.Normalize
import graft.lake.{LakeTable, Snapshot}
import graft.lake.LakeTable.FileEntry

/** MERGE INTO keyed on (conv_id, turn_idx) with the reference's
  * non-empty-wins update semantics (`_group_records_by_id`,
  * csv_handler.py:66-97): a staged drop's value overwrites the target only
  * when non-empty; empty/"" never clobbers existing data; unmatched staged
  * keys insert.
  *
  * Physical plan, scale-aware:
  *   1. the staged pipeline (align -> validate -> in-batch dedup) is
  *      persisted and evaluated ONCE — counts, the key-range agg and the
  *      join all read the cached frame, not re-run the groupBy;
  *   2. staged key range (one agg) -> TWO-LEVEL metadata pre-filter: only
  *      manifests whose persisted conv range overlaps the staged range are
  *      even OPENED (the rest carry forward unparsed), and within them only
  *      files whose stats overlap are rewritten — a merge touching 0.1% of
  *      conversations parses 0.1% of the manifests and rewrites 0.1% of the
  *      table;
  *   3. full-outer sort-merge join on the key (full outer cannot
  *      broadcast; both sides shuffle once on the key);
  *   4. per-column coalesce(nullif(staged, ''), target);
  *   5. range-repartition + sort on the cluster key, write, commitDelta:
  *      untouched files AND their manifests carry over verbatim.
  */
object MergeInto {

  final case class Result(snapshot: Snapshot, touchedFiles: Int, carriedFiles: Int,
                          stagedRows: Long, rejectedRows: Long,
                          openedManifests: Int = 0, totalManifests: Int = 0)

  /** `staged`: an all-string (or already-typed) drop frame; columns are
    * aligned by trimmed name, schema evolves append-only. If `staged` has a
    * `_seq` column it orders duplicate-key resolution within the batch
    * (last non-empty wins), mirroring drop-file line order; without one, a
    * partition-major row id stands in (read order for file-backed frames).
    */
  def merge(table: LakeTable, staged: DataFrame, tag: String,
            targetFileRows: Long = 1L << 20): Result = {
    val spark = table.spark
    // `_seq` is a control column (duplicate-key ordering within the batch),
    // never table data — pass it through alignment without schema evolution.
    val withSeq =
      if (staged.columns.contains("_seq")) staged
      else staged.withColumn("_seq", monotonically_increasing_id())
    val (alignedAll, evolvedSchema) = Normalize.alignToSchema(
      withSeq, table.schema, passthrough = Seq("_seq"))
    val aligned = alignedAll.persist(StorageLevel.MEMORY_AND_DISK)
    val (valid0, rejected) = Normalize.routeInvalid(aligned)

    // Resolve duplicate keys INSIDE the batch first (reference: later
    // records in one file overwrite non-empty field-by-field).
    val dataFields = evolvedSchema.fields.filterNot(f =>
      f.name == "conv_id" || f.name == "turn_idx")
    val stagedSeq = valid0.withColumn("__ord", col("_seq"))
    val aggs = dataFields.map { f =>
      val w = if (f.dataType == StringType)
        graft.ingest.Grouping.lastNonEmptyWins(col(s"`${f.name}`"), col("__ord"))
      else graft.ingest.Grouping.lastNonNullWins(col(s"`${f.name}`"), col("__ord"))
      w.as(f.name)
    }
    val dedup0 =
      if (aggs.isEmpty) stagedSeq.select("conv_id", "turn_idx").distinct()
      else stagedSeq.groupBy(col("conv_id"), col("turn_idx")).agg(aggs.head, aggs.tail: _*)
    val dedup = dedup0.persist(StorageLevel.MEMORY_AND_DISK)

    // ONE action computes count + key range (materializing the cache);
    // rejectedRows then reads the cached aligned frame.
    val aggRow = dedup.agg(count(lit(1)), min("conv_id"), max("conv_id")).head()
    val stagedRows = aggRow.getLong(0)
    val (lo, hi) = (Option(aggRow.getString(1)), Option(aggRow.getString(2)))
    val rejectedRows = rejected.count()

    // Two-level pre-filter, same rule as LakeTable.scan: manifests whose
    // PERSISTED aggregate conv range misses the staged range are never
    // OPENED — a 0.1%-range merge on a 10^6-file table parses the one
    // overlapping manifest JSON, not all thousand. Within overlapping
    // manifests, per-file stats select the rewrite set.
    val snap = table.currentSnapshot.getOrElse(
      throw new IllegalStateException(s"no snapshot to merge into at ${table.root}"))
    val pruned = (lo, hi) match {
      case (Some(l), Some(h)) => table.overlappingEntries(snap, Some((l, h)))
      case _ => // empty staged batch: nothing to rewrite, open NO manifests
        LakeTable.PrunedEntries(Vector.empty,
          snap.manifests.map(_.entryCount).sum, snap.manifests.size.toLong, 0L)
    }
    val touched = pruned.entries
    val carried = (pruned.totalFiles - touched.size).toInt

    // No-op merge (empty or all-rejected drop, nothing to rewrite): commit
    // NOTHING. Writing an empty data file per no-op merge would litter one
    // manifest entry per maintenance cadence tick on sparse drop streams —
    // 60-minute cadence, quiet weekend => dozens of empty files for
    // compaction to sweep. EXCEPT a schema-only drop: a zero-row batch that
    // still carries NEW columns must commit the widened schema (metadata
    // only, no data files) — silently dropping the evolution would lose the
    // one thing that batch said.
    if (stagedRows == 0 && touched.isEmpty) {
      aligned.unpersist()
      dedup.unpersist()
      if (evolvedSchema != table.schema) {
        val snapEv = table.commitDelta(Vector.empty, Vector.empty, "merge",
          Some(evolvedSchema), Map("merge_tag" -> tag, "schema_only" -> "true"))
        return Result(snapEv, 0, carried, 0L, rejectedRows,
          openedManifests = pruned.openedManifests.toInt,
          totalManifests = pruned.totalManifests.toInt)
      }
      val cur = table.currentSnapshot.get
      return Result(cur, 0, carried, 0L, rejectedRows,
        openedManifests = pruned.openedManifests.toInt,
        totalManifests = pruned.totalManifests.toInt)
    }

    val st = evolvedSchema.toStruct
    val target =
      if (touched.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), st)
      else table.readData(touched.map(e => table.absData(e.file.path)))

    val t = target.as("t")
    val s = dedup.as("s")
    val joined = t.join(s,
      col("t.conv_id") === col("s.conv_id") && col("t.turn_idx") === col("s.turn_idx"),
      "full_outer")

    val targetCols = table.schema.fieldNames.toSet
    val mergedCols =
      coalesce(col("s.conv_id"), col("t.conv_id")).as("conv_id") +:
      coalesce(col("s.turn_idx"), col("t.turn_idx")).as("turn_idx") +:
      dataFields.map { f =>
        val sCol = col(s"s.`${f.name}`")
        val tCol = if (targetCols(f.name)) col(s"t.`${f.name}`")
                   else lit(null).cast(f.dataType)
        val merged = f.dataType match {
          case StringType => coalesce(when(sCol =!= "", sCol), tCol)
          case _ => coalesce(sCol, tCol)
        }
        merged.as(f.name)
      }
    val merged = joined.select(mergedCols: _*)
      .select(evolvedSchema.fieldNames.map(n => col(s"`$n`")): _*)

    // Size output files by rows (we know exact input rows cheaply).
    val totalRows = touched.map(_.file.rows).sum + stagedRows
    val nOut = math.max(1, math.ceil(totalRows.toDouble / targetFileRows).toInt)
    // Range-partition directly on the key: merge outputs get tight per-file
    // conv ranges (prunable); the balanced Z-curve belongs to Clustering.
    val out = merged
      .repartitionByRange(nOut, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))

    val newEntries = table.writeDataFiles(out, tag)
    aligned.unpersist()
    dedup.unpersist()
    val snap2 = table.commitDelta(newEntries, touched, "merge", Some(evolvedSchema),
      Map("merge_tag" -> tag,
        "staged_rows" -> stagedRows.toString,
        "rejected_rows" -> rejectedRows.toString,
        "touched_files" -> touched.size.toString))
    Result(snap2, touched.size, carried, stagedRows, rejectedRows,
      openedManifests = pruned.openedManifests.toInt,
      totalManifests = pruned.totalManifests.toInt)
  }
}
