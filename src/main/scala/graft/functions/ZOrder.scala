package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{Bridge, ZOrder64}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Column-level API over the [[org.apache.spark.sql.graftx.ZOrder64]]
  * Catalyst expression plus the order-preserving conv_id key derivation.
  */
object ZOrder {

  /** Z-order key of two int columns (a's bits dominate the ordering). */
  def zorder64(a: Column, b: Column): Column =
    Bridge.toColumn(ZOrder64(Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Order-preserving 32-bit key for a conversation-id string.
    *
    * Range pruning on `conv_id BETWEEN lo AND hi` (the north-rule acceptance
    * metric) requires the clustering key's conv component to be MONOTONIC in
    * conv_id — a hash would destroy range locality and make per-file min/max
    * stats useless for range predicates. Two order-preserving encodings,
    * chosen per row:
    *   - ids of the form `<letters><digits>` (e.g. "c00001234"): the numeric
    *     suffix, which spreads uniformly over [0, nConvs);
    *   - anything else: the first 4 UTF-8 bytes big-endian (lexicographic
    *     prefix order).
    * Pure `Column` composition — codegen'd, no UDF.
    */
  def convOrderKey(conv: Column): Column = {
    val digits = regexp_extract(conv, "^[A-Za-z]{0,4}([0-9]{1,9})$", 1)
    val byDigits = when(digits =!= "", digits.cast(IntegerType))
    val padded = rpad(coalesce(conv, lit("")), 4, " ")
    val lex = (0 until 4).map { i =>
      shiftleft(ascii(substring(padded, i + 1, 1)).cast(LongType) % 256, (3 - i) * 8)
    }.reduce(_ + _)
    byDigits.otherwise(lex.cast(IntegerType))
  }

  /** The maintenance engine's clustering key:
    * interleave(convOrderKey(conv_id), turn_idx).
    */
  def clusterKey(convId: Column, turnIdx: Column): Column =
    zorder64(convOrderKey(convId), coalesce(turnIdx.cast(IntegerType), lit(0)))
}
