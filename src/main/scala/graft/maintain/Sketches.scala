package graft.maintain

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.lake.{LakeTable, MetaJson}

/** Lake-managed per-file sketch columns: MinHash signatures + SimHash
  * fingerprints of each turn's normalized text, persisted ONCE per
  * immutable data file under `<root>/sketches/<datafile-basename>/`.
  *
  * Why: at 100 TB, the sketch build (a full decompress-and-hash pass over
  * every text) dominates a dedup pass's cost. Data files are immutable, so
  * their sketches are too — computing them once per FILE instead of once
  * per PASS makes the steady-state dedup cadence O(files added since the
  * last pass), the same incremental discipline [[Clustering]]'s dirty-slab
  * reclustering applies to layout. The data-file basename (unique per
  * write attempt, never reused — see [[LakeTable.writeDataFiles]]) keys the
  * store, so coverage is simply "does the sketch dir exist": crash-safe
  * (a torn write is re-staged, never trusted — publication is an atomic
  * dir move), with no commit protocol of its own.
  *
  * Store layout:
  * {{{
  *   sketches/_meta.json                  sketch params (guarded, see ensure)
  *   sketches/<basename>/part-*.parquet   (conv_id, turn_idx, minhash, simhash)
  *   sketches/<basename>/.empty           marker: source file had no rows
  * }}}
  *
  * GC: [[OrphanGc.removeOrphans]] sweeps sketch dirs whose data file is no
  * longer referenced by any snapshot.
  */
object Sketches {

  final case class Params(shingleK: Int = 3, numHashes: Int = 32)

  final case class EnsureResult(
      sketches: DataFrame, // (conv_id, turn_idx, minhash, simhash, n_tokens, __src)
      totalFiles: Int,
      computedFiles: Int)

  private def storeDir(table: LakeTable): Path = Paths.get(table.root, "sketches")
  private def dirFor(table: LakeTable, dataFileBasename: String): Path =
    storeDir(table).resolve(dataFileBasename)

  /** A sketch dir counts as covered when it was atomically published —
    * either real part files or the explicit empty marker.
    */
  private def covered(d: Path): Boolean =
    Files.isDirectory(d) && (hasParts(d) || Files.exists(d.resolve(".empty")))

  private def hasParts(d: Path): Boolean =
    Files.isDirectory(d) &&
      LakeTable.listDir(d).exists(_.getFileName.toString.endsWith(".parquet"))

  /** Make the current snapshot fully sketch-covered, computing signatures
    * ONLY for data files without a published sketch dir (files added by
    * merges/compactions/dedup rewrites since the last call). One Spark job
    * covers all missing files: read-with-provenance -> per-row native
    * kernels -> write partitioned by source file -> atomic per-file dir
    * moves. Returns the full sketch frame for the snapshot plus how many
    * files actually computed.
    *
    * Params are pinned store-wide in `_meta.json`: calling with different
    * params than the store was built with throws — two generations of
    * signatures must never silently mix into one banding pass.
    */
  def ensure(table: LakeTable, params: Params = Params()): EnsureResult = {
    val spark = table.spark
    val store = storeDir(table)
    Files.createDirectories(store)
    checkOrWriteMeta(store, params)

    val files = table.currentFiles
    val missing = files.filterNot(f => covered(dirFor(table, basename(f.path))))

    if (missing.nonEmpty) {
      val staging = store.resolve(s"_staging-${java.util.UUID.randomUUID().toString.take(8)}")
      val rows = spark.read.schema(table.schema.toStruct)
        .parquet(missing.map(f => table.absData(f.path)): _*)
        .select(col("conv_id"), col("turn_idx"),
          Dedup.normalizedText(col("text")).as("__tn"),
          element_at(split(input_file_name(), "/"), -1).as("__file"))
        .select(col("conv_id"), col("turn_idx"),
          Dedup.minhashSignatureNative(col("__tn"), params.shingleK, params.numHashes)
            .as("minhash"),
          Dedup.simhash64Native(col("__tn")).as("simhash"),
          // token count of the normalized text rides along so downstream
          // eligibility filters (minTokens, non-empty) need no join back
          // to the raw text
          when(length(col("__tn")) === 0, 0)
            .otherwise(size(split(col("__tn"), " "))).cast("int").as("n_tokens"),
          col("__file"))
      rows.write.mode("overwrite").partitionBy("__file")
        .option("compression", "zstd").parquet(staging.toString)

      // publish: one atomic move per file dir; files that produced no rows
      // (empty parquet parts are legal writer output) get the empty marker
      missing.foreach { f =>
        val b = basename(f.path)
        val src = staging.resolve(s"__file=$b")
        val dst = dirFor(table, b)
        LakeTable.deleteRecursively(dst)
        if (Files.exists(src)) Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
        else {
          Files.createDirectories(dst)
          Files.createFile(dst.resolve(".empty"))
        }
      }
      LakeTable.deleteRecursively(staging)
    }

    val readable = files.map(f => dirFor(table, basename(f.path)))
      .filter(hasParts).map(_.toString)
    val sketches =
      if (readable.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("conv_id",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("turn_idx",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("minhash",
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
            org.apache.spark.sql.types.StructField("simhash",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n_tokens",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("__src",
              org.apache.spark.sql.types.StringType))))
      else spark.read.parquet(readable: _*)
        // provenance back to the TABLE-RELATIVE data path: the sketch dir
        // is named after the data file it mirrors
        .withColumn("__src",
          concat(lit("data/"), element_at(split(input_file_name(), "/"), -2)))
    EnsureResult(sketches, files.size, missing.size)
  }

  private[maintain] def basename(relPath: String): String =
    Paths.get(relPath).getFileName.toString

  /** Sweep sketch dirs whose data file is not in `referencedData` (relative
    * `data/...` paths) — called from [[OrphanGc]] so expired/superseded
    * files' sketches don't accumulate forever.
    */
  private[maintain] def sweepOrphans(
      table: LakeTable, referencedData: Set[String],
      oldEnough: Path => Boolean,
      deleted: scala.collection.mutable.Builder[String, Vector[String]],
      failures: scala.collection.mutable.Builder[String, Vector[String]]): Unit = {
    val store = storeDir(table)
    if (!Files.exists(store)) return
    LakeTable.listDir(store).filter(Files.isDirectory(_)).foreach { d =>
      val name = d.getFileName.toString
      // a data file's mirror dir is sweepable once the file is unreferenced;
      // a `_staging-*` dir is a CRASHED ensure()'s residue (a live one is
      // younger than any sane grace age) — `_meta.json` is a file, untouched
      val sweepable =
        if (name.startsWith("_staging-")) true
        else !name.startsWith("_") && !referencedData(s"data/$name")
      if (sweepable) {
        try if (oldEnough(d)) {
          LakeTable.deleteRecursively(d); deleted += s"sketches/$name"
        } catch { case e: Exception => failures += s"sketches/$name: ${e.getMessage}" }
      }
    }
  }

  private def checkOrWriteMeta(store: Path, params: Params): Unit = {
    val meta = store.resolve("_meta.json")
    if (Files.exists(meta)) {
      val n = MetaJson.read(Files.readString(meta))
      val existing = Params(n.get("shingle_k").asInt, n.get("num_hashes").asInt)
      require(existing == params,
        s"sketch store at $store was built with $existing, called with $params — " +
          "two signature generations must not mix; delete the store to rebuild")
    } else {
      val o = MetaJson.mapper.createObjectNode()
      o.put("shingle_k", params.shingleK)
      o.put("num_hashes", params.numHashes)
      o.put("normalization", "lower-ws-collapse")
      val tmp = store.resolve("_meta.json.tmp")
      Files.writeString(tmp, MetaJson.write(o))
      Files.move(tmp, meta, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
