package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication primitives for training-data pipelines: exact keys,
  * word-shingles, MinHash signatures + LSH banding, SimHash. All pure
  * `Column` compositions over built-ins (xxhash64, transform, aggregate) —
  * codegen'd, shuffle-free until the final groupBy/join, so the fan-out to
  * 100 TB is a single scan + one shuffle on band buckets.
  */
object Dedup {

  /** Exact-dedup key: xxhash64 of the normalized text (lower, collapsed
    * whitespace). Collision-safe enough for candidate generation; final
    * equality should re-check the normalized text.
    */
  def normalizedText(text: Column): Column =
    regexp_replace(lower(trim(coalesce(text, lit("")))), "\\s+", " ")

  /** k-word shingles as strings; shorter docs yield one whole-doc shingle. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = TextMetrics.tokens(text)
    val n = size(toks)
    when(n <= k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(1), n - k + 1),
        i => array_join(slice(toks, i, lit(k)), " ")))
  }

  /** MinHash signature: for seed s in [0, numHashes), min over shingles of
    * xxhash64(shingle, s). Empty shingle set -> all Long.MaxValue.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { s =>
      coalesce(
        array_min(transform(shingleCol, sh => xxhash64(sh, lit(s)))),
        lit(Long.MaxValue))
    }
    array(sigs: _*)
  }

  /** LSH band hashes: split the signature into `bands` rows of length
    * `rowsPerBand`, hash each band. Two docs sharing ANY band hash are
    * near-dup candidates.
    */
  def lshBandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column = {
    val bandHashes = (0 until bands).map { b =>
      xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand), lit(b))
    }
    array(bandHashes: _*)
  }

  /** 64-bit SimHash over whitespace tokens: per token t, take xxhash64(t);
    * each bit votes +1/-1; the sign of each bit-sum forms the fingerprint.
    * Single `aggregate` pass with a 64-long vote vector.
    */
  def simhash64(text: Column): Column =
    aggregate(
      TextMetrics.tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val bitVotes = array((0 until 64).map { j =>
          when(shiftright(h, j).bitwiseAND(1L) === 1L, lit(1L)).otherwise(lit(-1L))
        }: _*)
        zip_with(acc, bitVotes, (a, b) => a + b)
      },
      // finish: fold the 64 vote counters into sign bits. `votes` is a bound
      // lambda variable, so the 64 element_at reads don't duplicate work.
      votes => (0 until 64).map { j =>
        when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    )

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast(LongType)

  /** SimHash near-duplicate CANDIDATE pairs via banded Hamming join: the
    * 64-bit fingerprint splits into `bands` chunks (4 x 16 bits by default);
    * by pigeonhole, two fingerprints within Hamming distance `bands - 1`
    * (default <=3) MUST agree on at least one whole chunk, so joining on
    * (band index, chunk value) guarantees recall for Hamming <= bands-1 —
    * and in particular 100% recall for exact duplicates (distance 0). The
    * join is bucket-local, not all-pairs; `maxBucket` drops degenerate
    * buckets (e.g. the all-zeros chunk of empty docs) so one hot bucket
    * cannot go quadratic — same hygiene as [[minhashCandidatePairs]].
    *
    * Returns (id_a, id_b, hamming), id_a < id_b, hamming <= maxHamming.
    */
  def simhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3,
      maxBucket: Int = 200): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands, "pigeonhole guarantee needs maxHamming < bands")
    val chunkBits = 64 / bands
    val mask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1
    val fp = simhashDf(df, idCol, textCol)
    val banded = fp.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("simhash"), b * chunkBits).bitwiseAND(mask)
      }: _*)).as(Seq("band_idx", "chunk")))
    val capped = banded
      .withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "chunk")))
      .where(col("__bucket_n") <= maxBucket)
      .drop("__bucket_n")
    capped.as("a").join(capped.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.chunk") === col("b.chunk") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct() // pairs sharing several bands appear once
      .where(col("hamming") <= maxHamming)
  }

  /** Aggregate-shaped SimHash over a whole frame: explode tokens, vote per
    * bit via 64 conditional sums (map-side partial aggregation), fold the
    * signs. Same result as [[simhash64]] but the per-token work is done
    * once instead of inside a 64-wide fold — prefer this for corpus-scale
    * jobs. Returns (idCol, simhash); empty-token docs get simhash 0.
    */
  def simhashDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode_outer(TextMetrics.tokens(col(textCol))).as("t"))
    val h = xxhash64(col("t"))
    val votes = (0 until 64).map { j =>
      sum(when(col("t").isNull, 0)
        .when(shiftright(h, j).bitwiseAND(1L) === 1L, 1)
        .otherwise(-1)).as(s"b$j")
    }
    toks.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id").as(idCol),
        (0 until 64).map { j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Exact token-Jaccard candidate pairs with a DOCUMENT-FREQUENCY cap:
    * tokens appearing in more than `maxDF` documents (stopwords, boilerplate)
    * are dropped BEFORE the self-join — without the cap, a token shared by
    * f documents contributes f^2/2 joined pairs, so corpus-scale stopwords
    * go quadratic. With it, pair count is bounded by sum over kept tokens of
    * df^2/2 <= maxDF/2 * total kept postings (linear in corpus size for
    * fixed maxDF). Intersection/union are computed over the CAPPED
    * vocabulary on both sides, so the ratio stays a true Jaccard of the
    * filtered token sets. Returns (doc_a, doc_b, inter, uni).
    */
  def jaccardCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      minIntersection: Int = 1, maxDF: Int = 1000): DataFrame = {
    val words = df.select(col(idCol).as("doc_id"),
      explode(TextMetrics.tokens(col(textCol))).as("w")).distinct()
    val kept = words
      .withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("w")))
      .where(col("__df") <= maxDF)
      .drop("__df")
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = kept.as("a").join(kept.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .where(col("inter") >= minIntersection)
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("sa.n") + col("sb.n") - col("inter")).as("uni"))
  }

  /** MinHash-LSH near-duplicate candidate pairs over (idCol, textCol).
    *
    * Shape chosen for scale AND to defeat Catalyst's CollapseProject: a
    * pure-Column signature (`minhashSignature`) gets its shingle-array
    * argument INLINED into all numHashes array_min calls, recomputing the
    * shingles numHashes times per row (measured 40x slowdown). Instead:
    * explode shingles once, hash each shingle numHashes ways, and take
    * per-id mins via groupBy — partial (map-side) aggregation makes the
    * shuffle carry only numHashes longs per document.
    *
    * Degenerate LSH buckets (a band hash shared by huge swaths of the
    * corpus — stopword-only shingle sets and the like) are dropped via
    * `maxBucket`, standard LSH hygiene that bounds the pair blow-up.
    *
    * Returns (id_a, id_b, n_shared_bands), idA < idB.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = 200): DataFrame = {
    val rowsPerBand = numHashes / bands
    val shingled = df.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleK)).as("sh"))
    val minAggs = (0 until numHashes).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    val mins = shingled.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
    val sig = mins.select(col("id"),
      array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
    val exploded = sig.select(col("id"),
      posexplode(lshBandHashes(col("sig"), bands, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))
    val bucketed = exploded
      .withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_hash")))
      .where(col("__bucket_n") <= maxBucket)
      .drop("__bucket_n")
    bucketed.as("a").join(bucketed.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }
}
