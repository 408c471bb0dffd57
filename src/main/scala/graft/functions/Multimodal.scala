package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns next to typed metadata, and the
  * per-item operators (metadata extraction, frame sampling, chunking) are
  * pure Column compositions that scale like any other projection.
  *
  * The actual codecs (JPEG/PNG/audio decode) are NOT available in this
  * environment — `decodeStub` documents the seam where a real deployment
  * plugs a vectorized decoder (Arrow-batched pandas UDF via mapInPandas, or
  * a JNI codec inside mapPartitions); here it is a clearly-marked
  * DETERMINISTIC FAKE so the Spark-side schema, partitioning and batch
  * shape are real and tested even though the pixels are not.
  */
object Multimodal {

  /** Canonical media-item schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("content", BinaryType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Deterministic fake media table derived from a text corpus: payload =
    * UTF-8 bytes of the text (stands in for encoded media), dimensions
    * derived from a seeded hash. Lets every downstream operator be
    * exercised end-to-end without image libraries.
    */
  def fakeMediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val content = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      element_at(typedLit(Seq("image/png", "image/jpeg", "audio/wav")),
        (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      content.as("content"),
      octet_length(content).cast(LongType).as("n_bytes"),
      (pmod(xxhash64(col(idCol), lit("w")), lit(1920)) + 16).cast(IntegerType).as("width"),
      (pmod(xxhash64(col(idCol), lit("h")), lit(1080)) + 16).cast(IntegerType).as("height"))
  }

  /** STUB: decoded-feature extraction. A real deployment replaces the body
    * with an Arrow-batched decoder (mapInPandas / JNI); the SIGNATURE —
    * binary in, fixed-width float vector out — and everything downstream
    * (schema, shuffle, ANN indexing over the features) is the real thing.
    * The fake projects deterministic pseudo-features from payload bytes so
    * results are reproducible.
    */
  def decodeStub(content: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(content, i), lit(1000L)).cast(DoubleType) / 500.0) - 1.0)

  /** Fixed-size chunking of a binary payload (frame sampling / shard-for-
    * transport): returns an array of <= maxChunks slices of chunkBytes.
    */
  def binaryChunks(content: Column, chunkBytes: Int, maxChunks: Int = 64): Column = {
    val n = least(ceil(octet_length(content).cast(DoubleType) / chunkBytes).cast(IntegerType),
      lit(maxChunks))
    when(octet_length(content) === 0, array().cast(ArrayType(BinaryType)))
      .otherwise(transform(sequence(lit(0), n - 1), i =>
        content.substr((i * chunkBytes + 1).cast(IntegerType), lit(chunkBytes))))
  }

  /** Number of fixed-size frames a payload yields (exact integer math —
    * oracle-reproducible).
    */
  def frameCount(content: Column, chunkBytes: Int): Column =
    ceil(octet_length(content).cast(DoubleType) / chunkBytes).cast(LongType)
}
