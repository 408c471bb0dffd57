package graft.functions

/** Bit-interleaving (Morton / Z-order) helpers.
  *
  * `interleave(a, b)` produces the 64-bit Z-order key of two unsigned 32-bit
  * values: bit i of `a` lands at position 2i+1, bit i of `b` at position 2i.
  * Standard magic-number bit spreading — 6 ops per operand, branch-free, so
  * the generated code stays inside whole-stage codegen as a static call.
  *
  * Used as the clustering key of the lakehouse maintenance engine
  * (north rule: "Z-order/Hilbert clustering on (conv_id, turn_idx) via
  * 64-bit key interleave").
  */
object Morton {

  /** Spread the low 32 bits of `v` so bit i moves to bit 2i. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** 64-bit Z-order key of (a, b); a's bits occupy the odd (higher)
    * positions so `a` dominates the ordering.
    */
  def interleave(a: Int, b: Int): Long = (spread(a) << 1) | spread(b)

  /** Inverse of [[spread]]: compact even-position bits back to an Int. */
  def compact(x0: Long): Int = {
    var x = x0 & 0x5555555555555555L
    x = (x | (x >>> 1))  & 0x3333333333333333L
    x = (x | (x >>> 2))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4))  & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8))  & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x.toInt
  }

  def deinterleave(z: Long): (Int, Int) = (compact(z >>> 1), compact(z))

  /** 2-D Hilbert index of (x, y) on a 2^order x 2^order grid (classic
    * rotate-and-accumulate walk). Hilbert has strictly better worst-case
    * locality than Z (no curve jumps), at the cost of not being a simple
    * bit-interleave; offered as the alternative clustering curve.
    */
  def hilbert(order: Int, x0: Int, y0: Int): Long = {
    var x = x0; var y = y0
    var d = 0L
    var s = 1 << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse of [[hilbert]]: index -> (x, y). */
  def hilbertInverse(order: Int, d0: Long): (Int, Int) = {
    var x = 0; var y = 0
    var t = d0
    var s = 1
    while (s < (1 << order)) {
      val rx = (1L & (t / 2)).toInt
      val ry = (1L & (t ^ rx)).toInt
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
