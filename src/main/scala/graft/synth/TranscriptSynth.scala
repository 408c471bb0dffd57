package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic generator of the canonical transcript table
  * (conv_id:string, turn_idx:int, role:string, text:string, tool:string,
  * ts:timestamp) — the `input_hint` shape. No wall clock, no Math.random:
  * everything derives from xxhash64(seed, conv, turn), so the same
  * (nConvs, seed, baseTs) always produces byte-identical data.
  *
  * Conversation sizes are Zipf-ish (hash^2 shaping) and conv 0 is forced
  * hot (~a large multiple of the mean) to exercise skew handling
  * (salting + AQE) in the clustering shuffle.
  */
object TranscriptSynth {

  val Vocab: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "plan", "tool", "call", "result", "user",
    "model", "agent", "turn", "context", "token", "search", "read", "write",
    "merge", "table", "scan", "query", "data", "batch", "stream", "spark")

  val Roles: Seq[String] = Seq("user", "assistant", "tool")
  val Tools: Seq[String] = Seq("bash", "read", "write", "grep", "edit")

  val BaseTsMillis: Long = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  /** Deterministic uniform long in [0, n) from hashed parts. */
  private def h(n: Int, parts: org.apache.spark.sql.Column*) =
    pmod(xxhash64(parts: _*), lit(n.toLong))

  def turns(spark: SparkSession, nConvs: Int, seed: Long,
            maxTurnsPerConv: Int = 40): DataFrame = {
    val conv = spark.range(nConvs.toLong).toDF("conv_seq")
    val s = lit(seed)

    // Zipf-ish sizes in [2, maxTurnsPerConv]; conv 0 is the hot conversation.
    val u = h(1000, s, col("conv_seq"), lit("size")).cast(DoubleType) / 1000.0
    val base = (pow(u, 3.0) * (maxTurnsPerConv - 2)).cast(IntegerType) + 2
    val hotSize = least(lit(maxTurnsPerConv * 25), lit(1000))
    val sized = conv.withColumn("n_turns",
      when(col("conv_seq") === 0, hotSize).otherwise(base))

    val exploded = sized
      .withColumn("conv_id", format_string("c%08d", col("conv_seq")))
      .select(col("conv_id"), col("conv_seq"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))

    val k = Vocab.size
    val nWords = (h(18, s, col("conv_seq"), col("turn_idx"), lit("len")) + 3).cast(IntegerType)
    val words = transform(sequence(lit(0), nWords - 1), i => {
      val idx = h(k, s, col("conv_seq"), col("turn_idx"), i.cast(LongType))
      element_at(typedLit(Vocab), (idx + 1).cast(IntegerType))
    })
    // ~2% of texts start with a formula-injection payload.
    val inj = h(50, s, col("conv_seq"), col("turn_idx"), lit("inj")) === 0
    val payload = element_at(typedLit(Seq("=SUM(A1)", "+CMD", "-system", "@import")),
      (h(4, s, col("conv_seq"), col("turn_idx"), lit("pay")) + 1).cast(IntegerType))
    val text = when(inj, concat(payload, lit(" "), array_join(words, " ")))
      .otherwise(array_join(words, " "))

    val role = element_at(typedLit(Roles), (col("turn_idx") % 3 + 1).cast(IntegerType))
    val tool = when(role === "tool",
      element_at(typedLit(Tools),
        (h(Tools.size, s, col("conv_seq"), col("turn_idx"), lit("tool")) + 1).cast(IntegerType)))
      .otherwise(lit(null).cast(StringType))

    val ts = timestamp_millis(
      lit(BaseTsMillis) + col("conv_seq") * 60000L + col("turn_idx") * 1000L)

    exploded.select(
      col("conv_id"),
      col("turn_idx").cast(IntegerType).as("turn_idx"),
      role.as("role"),
      text.as("text"),
      tool.as("tool"),
      ts.as("ts"))
  }

  /** The canonical transcript StructType (field order = field-ID order). */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))
}
