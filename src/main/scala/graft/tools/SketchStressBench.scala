package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.functions.{Dedup, VectorOps}

/** Sketch-suite stress evidence: candidate-pair counts and wall time for
  * the MinHash-LSH, SimHash-banded and ANN-LSH candidate joins across a
  * 1x / 3x / 10x synthetic corpus — the caps and the distinct-fingerprint
  * banding must keep pair counts ~LINEAR in corpus size (each scale step
  * carries the same proportional mix of exact dups and near dups, so a
  * quadratic candidate blow-up would show immediately).
  *
  * Synthesis is fully deterministic (xxhash64-driven, no RNG): doc i draws
  * 30-150 tokens from a 5000-word vocabulary; per 20 docs one exact
  * duplicate and one near duplicate (one appended token). Embeddings are
  * 64-dim xxhash64-derived floats with an exact-duplicate vector per 20.
  *
  * Usage: `runMain graft.tools.SketchStressBench [sizes...]`
  * (default 5000 15000 50000); appends a table to BENCH.md.
  */
object SketchStressBench {

  def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    // ==19 seeds from id-2 (doc 17's seed, an `otherwise` doc) -> EXACT
    // duplicate of doc 17. ==18 seeds from id-2 as well (doc 16) but appends
    // a token -> NEAR duplicate of doc 16. Seeding ==19 from id-1 would
    // chain through the near-dup's shifted seed and produce no exact copy.
    val seed = when(pmod(col("id"), lit(20)) === 19, col("id") - 2)
      .when(pmod(col("id"), lit(20)) === 18, col("id") - 2)
      .otherwise(col("id"))
    val len = (lit(30) + pmod(xxhash64(seed, lit(-1)), lit(120))).cast("int")
    val toks = transform(sequence(lit(0), len - 1),
      j => concat(lit("w"), pmod(xxhash64(seed, j), lit(5000))))
    val extra = when(pmod(col("id"), lit(20)) === 18,
      concat(lit(" nd"), col("id"))).otherwise(lit(""))
    spark.range(n).select(col("id").as("doc_id"),
      concat(array_join(toks, " "), extra).as("text"))
  }

  def synthVecs(spark: SparkSession, n: Long): DataFrame = {
    val seed = when(pmod(col("id"), lit(20)) === 19, col("id") - 1).otherwise(col("id"))
    val vec = transform(sequence(lit(0), lit(63)),
      j => ((pmod(xxhash64(seed, j), lit(2000)) - 1000) / lit(1000.0)).cast(FloatType))
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(5000L, 15000L, 50000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = sizes.map { n =>
      val docs = synthDocs(spark, n).persist()
      val vecs = synthVecs(spark, n).persist()
      docs.count(); vecs.count() // materialize outside the timed region
      val (mh, tMh) = timed(Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
      val (sh, tSh) = timed(Dedup.simhashCandidatePairs(docs, "doc_id", "text").count())
      // LSH planes must GROW with the corpus (bucket size ~ n/2^planes, and
      // within-bucket work is quadratic in it): hold expected bucket size
      // ~20 by scaling planes with log2(n) — the knob a 100 TB deployment
      // turns, and what keeps the join bucket-local at any scale.
      val planes = math.max(8, (math.log(n / 20.0) / math.log(2)).ceil.toInt)
      val (ann, tAnn) = timed(
        VectorOps.lshBucketTopK(vecs, "vec_id", "embedding", 5,
          nPlanes = planes, maxBucket = 2000).count())
      // IVF's knob is nLists ~ sqrt(n): expected list size ~ sqrt(n), so
      // probe work (nProbe lists) and assignment work (nLists distances)
      // both grow as sqrt(n) per query — the balanced operating point.
      val nLists = math.max(16, math.sqrt(n.toDouble).round.toInt)
      val (ivf, tIvf) = timed(
        VectorOps.ivfTopK(vecs, "vec_id", "embedding", 5,
          nLists = nLists, nProbe = 4, maxList = 2000).count())
      docs.unpersist(); vecs.unpersist()
      println(s"""{"n":$n,"minhash_pairs":$mh,"minhash_sec":$tMh,""" +
        s""""simhash_pairs":$sh,"simhash_sec":$tSh,"ann_planes":$planes,""" +
        s""""ann_rows":$ann,"ann_sec":$tAnn,"ivf_lists":$nLists,""" +
        s""""ivf_rows":$ivf,"ivf_sec":$tIvf}""")
      (n, mh, tMh, sh, tSh, ann, tAnn, ivf, tIvf)
    }

    val md = new StringBuilder
    md.append(s"\n## Sketch-suite stress (${java.time.Instant.now()}, " +
      "deterministic synth corpus, 1x/3x/10x)\n\n")
    md.append("| docs | minhash pairs | sec | simhash pairs | sec | ann top-k rows (planes scaled) | sec | ivf rows (lists ~ sqrt n) | sec |\n")
    md.append("|---|---|---|---|---|---|---|---|---|\n")
    rows.foreach { case (n, mh, tMh, sh, tSh, ann, tAnn, ivf, tIvf) =>
      md.append(f"| $n | $mh | $tMh%.1f | $sh | $tSh%.1f | $ann | $tAnn%.1f | $ivf | $tIvf%.1f |\n")
    }
    val base = rows.head
    val last = rows.last
    val scale = last._1.toDouble / base._1
    md.append(f"\nCorpus x$scale%.0f -> minhash pairs x${last._2.toDouble / base._2}%.1f, " +
      f"simhash pairs x${last._4.toDouble / base._4}%.1f, ann rows x${last._6.toDouble / base._6}%.1f, " +
      f"ivf rows x${last._8.toDouble / base._8}%.1f " +
      "(linear = the caps + distinct-fingerprint banding bound the join fan-out; " +
      "each scale step carries the same 5% exact-dup / 5% near-dup mix).\n")
    val benchMd = Paths.get("BENCH.md")
    val existing = if (Files.exists(benchMd)) Files.readString(benchMd) else "# BENCH\n"
    Files.writeString(benchMd, existing + md)
    spark.stop()
  }
}
