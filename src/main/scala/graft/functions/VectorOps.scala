package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding-similarity primitives: cosine / dot product over
  * `array<float>` columns, brute-force top-k, and two approximate variants
  * for the 100 TB scale path (LSH buckets, IVF cells). The dot product is a
  * native codegen'd Catalyst expression ([[org.apache.spark.sql.graftx.DotF32]]);
  * everything else is built-in `Column` composition — no UDFs.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftx.{Bridge, DotF32}
    Bridge.toColumn(DotF32(Bridge.toExpression(a), Bridge.toExpression(b)))
  }

  /** The pre-DotF32 formulation, kept as the cross-check reference for the
    * codegen parity test: interpreted per-element lambdas, same null
    * semantics.
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
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

  /** Random-hyperplane LSH bucket id (nPlanes sign bits) for a vector —
    * native codegen'd expression ([[org.apache.spark.sql.graftx.LshBucketF32]]),
    * bit-identical to [[lshBucketHof]] (the coalesce reproduces its NULL-vector
    * behavior: a null array bucketed to 0, not dropped from bucket joins).
    */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    import org.apache.spark.sql.graftx.{Bridge, LshBucketF32}
    coalesce(
      Bridge.toColumn(LshBucketF32(Bridge.toExpression(vec), nPlanes)), lit(0L))
  }

  /** The pre-LshBucketF32 Column formulation, kept as the parity-test
    * reference (nPlanes interpreted aggregate/zip_with passes per row).
    */
  private[graft] def lshBucketHof(vec: Column, nPlanes: Int): Column = {
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
  /** Deterministically down-sample rows of keys held by more than `maxN`
    * rows to ~maxN (keep iff xxhash64(id) = 0 mod ceil(n/maxN)) — the
    * degenerate-key cap shared by the LSH and IVF candidate paths. Sizes
    * come from groupBy (map-side partial aggregation); no forced broadcast
    * hint on the heavy-key set — it is |rows|/maxN entries, usually tiny
    * but unbounded at corpus scale, so AQE picks broadcast-vs-shuffle from
    * its ACTUAL runtime size.
    */
  private def downsampleHeavyKeys(
      df: DataFrame, key: String, idCol: String, maxN: Int): DataFrame = {
    val heavy = df.groupBy(key).agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxN)
    df.join(heavy, Seq(key), "left_outer")
      .where(col("__n").isNull ||
        pmod(xxhash64(col(idCol)),
          ceil(col("__n").cast("double") / maxN).cast("long")) === 0)
      .drop("__n")
  }

  def lshBucketTopK(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 8, maxBucket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val withB = downsampleHeavyKeys(bucketed, "bucket", "id", maxBucket)
    val a = withB.select(col("id").as("query_id"), col("v").as("qv"), col("bucket"))
    val b = withB.select(col("id").as("cand_id"), col("v").as("cv"), col("bucket"))
    val scored = a.join(b, Seq("bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) approximate top-k — the second scale path next to
    * [[lshBucketTopK]], trading LSH's data-independent buckets for
    * data-ADAPTED cells: `nLists` coarse centroids are seeded from a
    * deterministic hash-ordered sample, optionally refined by `refineIters`
    * Lloyd steps (assign all vectors to their nearest centroid, recompute
    * each cell's mean — every step plain joins + map-side-combinable
    * aggregations), and each vector lands in exactly ONE inverted list.
    * A query probes its `nProbe` nearest cells and scores only those lists:
    * per-query work is nLists centroid distances + ~nProbe/nLists of the
    * corpus, against LSH's recall cliff when fixed hyperplanes misfit the
    * data distribution.
    *
    * Scale shape: the centroid table (nLists rows) BROADCASTS to the
    * assignment join — the only corpus-wide pass — and the probe join
    * shuffles on cell id. `maxList` caps a degenerate cell (all-identical
    * embeddings collapsing into one list) by deterministic down-sampling,
    * exactly as lshBucketTopK caps its buckets; sizes come from groupBy
    * (map-side partial agg), never a Window over the hot cell.
    *
    * Recall floor independent of centroid quality: a query's exact
    * duplicate assigns to the SAME nearest cell (assignment depends only on
    * the vector value and the shared centroid set), so with any nProbe >= 1
    * a planted copy is always probed.
    *
    * Returns (query_id, cand_id, cos, rank) like [[lshBucketTopK]].
    */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, nLists: Int = 64, nProbe: Int = 4,
      refineIters: Int = 1, maxList: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.FloatType
    // norms computed ONCE per row (and once per centroid) — cosine against
    // every centroid then costs one dot product per pair instead of
    // re-deriving both norms inside each of the corpus x nLists pairs
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def withCentNorm(c: DataFrame): DataFrame =
      c.select(col("cell"), col("cv"), norm(col("cv")).as("ncv"))
    def pairCos: Column =
      when(col("nv") === 0.0 || col("ncv") === 0.0, lit(0.0))
        .otherwise(dot(col("v"), col("cv")) / (col("nv") * col("ncv")))

    // deterministic seed centroids: the nLists vectors of smallest
    // xxhash64(id) — RNG-free sampling. The hash-rank numbering happens
    // DRIVER-SIDE on the collected <= nLists (64) rows: a global
    // `Window.orderBy` over them would execute identically (one tiny
    // partition) but spams the log with WindowExec's no-partition warning
    // — which must stay reserved for REAL single-partition regressions —
    // and a constant partitionBy is folded away by EliminateWindowPartitions.
    // The collect is bounded by the nLists CONSTANT, never by data size.
    // Rebuilt via createDataFrame with the vector column's OWN schema:
    // array<float> and array<double> callers both keep their element type
    // (an encoder-typed round-trip through Seq[Float] would break doubles).
    val spark0 = df.sparkSession
    val vecField = base.schema("v")
    val seedRows = base.select(col("v").as("cv"), xxhash64(col("id")).as("__h"))
      .orderBy("__h").limit(nLists)
      .collect()
    val seedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      vecField.copy(name = "cv")))
    val seedData: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(seedRows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i + 1, r.get(0))
      }: _*)
    var centroids = withCentNorm(spark0.createDataFrame(seedData, seedSchema))

    // all corpus x centroid scores (the broadcast assignment pass)
    def scoreAll(cents: DataFrame): DataFrame =
      base.crossJoin(broadcast(cents))
        .select(col("id"), col("v"), col("nv"), col("cell"), pairCos.as("ccos"))

    // Lloyd refinement: assign every vector to its nearest cell (max_by —
    // no per-id Window), then move each cell to the mean of its members,
    // per-dimension (posexplode -> avg -> re-assemble ordered by dimension
    // index); cells that lose every member simply disappear.
    for (_ <- 1 to refineIters) {
      centroids = withCentNorm(scoreAll(centroids)
        .groupBy("id")
        .agg(max_by(col("cell"), struct(col("ccos"), -col("cell"))).as("cell"),
          first(col("v")).as("v"))
        .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cell", "i").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("sm"))
        .select(col("cell"),
          transform(col("sm"), s => s.getField("m").cast(FloatType)).as("cv")))
    }

    // ONE final scoring pass serves both sides: the argmax row per id is
    // its inverted-list assignment, the top-nProbe rows are its probes
    val scored = scoreAll(centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // inverted lists, degenerate cells down-sampled to ~maxList (list-side
    // only: every query keeps its answer, the join stays queries x maxList)
    val lists0 = scored.groupBy("id")
      .agg(max_by(col("cell"), struct(col("ccos"), -col("cell"))).as("cell"),
        first(col("v")).as("v"), first(col("nv")).as("nv"))
    val lists = downsampleHeavyKeys(lists0, "cell", "id", maxList)
      .select(col("cell"), col("id").as("cand_id"), col("v").as("cv"),
        col("nv").as("ncv"))

    // probe: every row queries its nProbe nearest cells (per-query Window
    // over nLists centroid scores — bounded, not a hot key)
    val probed = scored
      .withColumn("__pr", row_number().over(Window.partitionBy("id")
        .orderBy(col("ccos").desc, col("cell").asc)))
      .where(col("__pr") <= nProbe)
      .select(col("id").as("query_id"), col("v"), col("nv"), col("cell"))

    // no dedup needed: a candidate lives in exactly ONE cell (argmax
    // assignment), so a (query, cand) pair arises through at most one of
    // the query's probed cells — a distinct() here would shuffle the whole
    // ~nProbe x n^1.5 scored intermediate a second time for nothing
    val pairs = probed.join(lists, Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id").as("cand_id"), pairCos.as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    val out = pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    Dedup.materializeAndRelease(out, base, scored)
  }
}
