package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding-similarity primitives: cosine / dot product over
  * `array<float>` columns, brute-force top-k, and an LSH-bucketed
  * approximate variant for the 100 TB scale path. Pure `zip_with` /
  * `aggregate` compositions — no UDFs.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Brute-force cosine top-k: every query row against every candidate row.
    * Baseline for correctness; at scale use [[lshBucketTopK]] so the join is
    * bucket-local instead of a full cartesian.
    */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    import org.apache.spark.sql.expressions.Window
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane sign for (dim index i, plane j):
    * derived from xxhash64 of the pair — reproducible without Math.random.
    */
  private def planeSign(i: Column, j: Int): Column =
    when(pmod(xxhash64(i, lit(j)), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (nPlanes sign bits) for a vector. */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v.cast(DoubleType) * planeSign(i, j)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: join only within the LSH bucket (same sign pattern).
    * Recall < 1.0 by construction; scale path for ANN over 100 TB — the
    * cartesian becomes bucket-local (expected bucket size n / 2^planes).
    * A DEGENERATE bucket (e.g. the all-zeros sign pattern collecting a
    * constant-sign slice of the corpus) would go quadratic: buckets over
    * `maxBucket` members are DOWN-SAMPLED to ~maxBucket deterministically
    * (keep iff xxhash64(id) = 0 mod ceil(n/maxBucket)), bounding any
    * bucket's join to ~maxBucket^2. SKEW-SAFE by construction: bucket sizes
    * come from groupBy (map-side partial aggregation) and the heavy-bucket
    * set — at most |rows|/maxBucket entries — broadcasts; a
    * row_number-over-Window cap would first collect the degenerate bucket's
    * every member on one task, the exact stall the cap exists to prevent.
    */
  def lshBucketTopK(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 8, maxBucket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // no forced broadcast hint on the heavy-bucket set: it is n/maxBucket
    // rows — usually tiny, but unbounded at corpus scale — so AQE picks
    // broadcast-vs-shuffle from its ACTUAL runtime size
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val heavy = bucketed.groupBy("bucket").agg(count(lit(1)).as("__bn"))
      .where(col("__bn") > maxBucket)
    val withB = bucketed
      .join(heavy, Seq("bucket"), "left_outer")
      .where(col("__bn").isNull ||
        pmod(xxhash64(col("id")), ceil(col("__bn").cast("double") / maxBucket).cast("long")) === 0)
      .drop("__bn")
    val a = withB.select(col("id").as("query_id"), col("v").as("qv"), col("bucket"))
    val b = withB.select(col("id").as("cand_id"), col("v").as("cv"), col("bucket"))
    val scored = a.join(b, Seq("bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
