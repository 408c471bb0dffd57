package graft.functions

/** Static helper behind the BucketByCuts codegen (one static call keeps it
  * inside whole-stage codegen).
  */
object Buckets {
  /** Index of the quantile bucket `v` falls into given sorted `cuts`:
    * bucket i covers (cuts(i-1), cuts(i)]; values beyond the last cut land
    * in bucket cuts.length.
    */
  def of(v: Long, cuts: Array[Long]): Int = {
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) i else -i - 1
  }
}
