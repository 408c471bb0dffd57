package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop text-sketch kernels called from generated code (one static
  * call per row — see [[org.apache.spark.sql.graftx.SimHash64F]] /
  * [[org.apache.spark.sql.graftx.MinHashSigF]]). Each reproduces its Column
  * formulation BIT-EXACTLY:
  *
  *   - tokens = `trim` then Java-regex `\s+` split (empty text -> no
  *     tokens), the same semantics as `TextMetrics.tokens` (Spark's trim
  *     strips the same <= 0x20 range as String.trim, and StringSplit applies
  *     the identical java.util.regex pattern);
  *   - token/shingle hashes use the same xxhash64 chain Spark's `xxhash64`
  *     computes: UTF-8 bytes with seed 42, then `hashInt(seedArg, prev)`
  *     for the per-hash integer argument.
  *
  * Why kernels instead of the Column shapes: the per-row `aggregate` fold
  * runs interpreted per TOKEN x 64 bits, and the corpus-scale explode ->
  * groupBy shape pays a full extra stage (explode, partial agg, exchange,
  * final agg) per sketch build. One codegen'd pass per row computes the
  * whole sketch with zero shuffle.
  */
object SketchKernels {

  /** Whitespace tokens, parity with `TextMetrics.tokens`. */
  private def whitespaceTokens(s: UTF8String): Array[String] = {
    val t = s.toString.trim
    if (t.isEmpty) Array.empty[String] else t.split("\\s+")
  }

  private def hashUtf8(str: String, seed: Long): Long = {
    val b = str.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  /** 64-bit SimHash, parity with `Dedup.simhash64`/`Dedup.simhashDf`:
    * per token h = xxhash64(token); bit j votes +1/-1 by (h >> j) & 1; the
    * fingerprint sets bit j iff its vote sum is > 0. No tokens -> 0L.
    */
  def simhash64(s: UTF8String): Long = {
    val toks = whitespaceTokens(s)
    val votes = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val h = hashUtf8(toks(ti), 42L)
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      ti += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  /** MinHash signature over k-word shingles, parity with the
    * explode(wordShingles) -> `min(xxhash64(sh, i))` groupBy shape:
    * docs with <= k tokens contribute ONE whole-doc shingle (tokens joined
    * by single spaces; empty text -> the "" shingle), longer docs the
    * n-k+1 sliding shingles; hash i of a shingle is
    * `hashInt(i, xxhash64(shingleBytes, 42))`.
    */
  def minhashSig(s: UTF8String, shingleK: Int, numHashes: Int): Array[Long] = {
    val toks = whitespaceTokens(s)
    val n = toks.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    def addShingle(sh: String): Unit = {
      val base = hashUtf8(sh, 42L)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    if (n <= shingleK) addShingle(toks.mkString(" "))
    else {
      var i = 0
      while (i + shingleK <= n) {
        addShingle(toks.slice(i, i + shingleK).mkString(" "))
        i += 1
      }
    }
    mins
  }
}
