package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop vector kernels called from generated code (one static call per
  * row — see [[org.apache.spark.sql.graftx.DotF32]]). Operating directly on
  * Catalyst's ArrayData avoids the per-ELEMENT boxing and array allocation a
  * `zip_with`/`aggregate` higher-order-function chain pays: those lambdas are
  * interpreted per element, which at corpus x centroid fan-out (the IVF
  * assignment pass computes n x nLists dots) dominated the ANN runtime.
  *
  * Null semantics mirror the HOF formulation they replace: mismatched
  * lengths or a null element yield null (zip_with pads with null, and
  * null poisons the aggregate fold); two empty arrays dot to 0.0.
  */
object VecMath {

  /** Dot product with per-side element width chosen by codegen-constant
    * flags (JIT specializes each call site): `array<double>` inputs keep
    * their full 52-bit mantissa instead of being implicitly cast down to
    * float — the HOF formulation this kernel replaces computed in double
    * throughout, and a silent float round-trip would change results for
    * double-typed callers.
    */
  def dotMixed(a: ArrayData, b: ArrayData,
               aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Random-hyperplane LSH bucket id: plane j's sign for dimension i is
    * derived from the SAME xxhash64 chain the Column formulation used
    * (`xxhash64(i, j)` = XXH64.hashInt(i, seed=42) re-seeded with j), so
    * buckets are bit-identical to the `zip_with`/`aggregate` version this
    * replaces — INCLUDING the degenerate inputs: a null element nulls every
    * projection, whose `when(proj >= 0, bit).otherwise(0)` collapsed to
    * bucket 0, and an EMPTY vector also lands in bucket 0 (legacy
    * `sequence(0, size-1)` on size 0 produced [0, -1], whose null-padded
    * zip poisoned every projection — not an all-bits 0.0 projection).
    */
  def lshBucketF32(v: ArrayData, nPlanes: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = v.numElements()
    if (n == 0) return 0L
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var proj = 0.0
      var anyNull = false
      var i = 0
      while (i < n && !anyNull) {
        if (v.isNullAt(i)) anyNull = true
        else {
          val h = XXH64.hashInt(j, XXH64.hashInt(i, 42L))
          val sign = if ((h & 1L) == 0L) 1.0 else -1.0
          proj += v.getFloat(i).toDouble * sign
          i += 1
        }
      }
      // NOT `proj >= 0`: Java orders NaN below everything (`NaN >= 0` is
      // false) while Spark SQL's `when(proj >= 0, ...)` orders NaN ABOVE
      // every number (true) — a vector whose Inf elements cancel to NaN
      // must land in the same bucket on both paths, so use the negation
      // that Java evaluates the Spark way.
      if (!anyNull && !(proj < 0)) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}
