package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ingest.{Ingest, Normalize}
import graft.lake.TableSchema
import graft.synth.TranscriptSynth

/** Drop-file lifecycle (reference S1 + edge cases) and the schema-evolution
  * drop fixtures of FIXTURES.md §6.
  */
class IngestFileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String, bytes: Array[Byte]): String = {
    val dir = Paths.get("target", "test-drops")
    Files.createDirectories(dir)
    val p = dir.resolve(s"${System.nanoTime()}-$name")
    Files.write(p, bytes)
    p.toString
  }

  test("validateDropFile: extension, existence, size cap (validators.py:10-30)") {
    val ok = tmp("good.csv", "a,b\n1,2\n".getBytes(StandardCharsets.UTF_8))
    assert(Ingest.validateDropFile(ok).isRight)
    assert(Ingest.validateDropFile(ok.replace(".csv", ".txt")).isLeft) // missing too
    val wrongExt = tmp("bad.txt", "a,b\n".getBytes(StandardCharsets.UTF_8))
    assert(Ingest.validateDropFile(wrongExt).isLeft)
  }

  test("validateDropFile: content type checked when supplied (validators.py:24-29)") {
    val ok = tmp("typed.csv", "a,b\n1,2\n".getBytes(StandardCharsets.UTF_8))
    assert(Ingest.validateDropFile(ok, Some("text/csv")).isRight)
    assert(Ingest.validateDropFile(ok, Some("TEXT/CSV; charset=utf-8")).isRight)
    assert(Ingest.validateDropFile(ok, Some("application/vnd.ms-excel")).isRight)
    assert(Ingest.validateDropFile(ok, Some("application/json")).isLeft)
    assert(Ingest.validateDropFile(ok, None).isRight) // transport gave none
  }

  test("parseDropFile: UTF-8 BOM tolerated (utf-8-sig, file_service.py:37-39)") {
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val body = "conv_id,text\nc1,hello\n".getBytes(StandardCharsets.UTF_8)
    val p = tmp("bom.csv", bom ++ body)
    val res = Ingest.parseDropFile(spark, p)
    assert(res.fields == Seq("conv_id", "text"), s"fields were ${res.fields}")
    assert(res.records.count() == 1)
  }

  test("schema evolution drops a/b/c (FIXTURES.md §6)") {
    import spark.implicits._
    val base = TableSchema.fromStruct(TranscriptSynth.schema)

    // drop_a: missing tool/ts -> nulls
    val dropA = Seq(("c1", "0", "user", "hi")).toDF("conv_id", "turn_idx", "role", "text")
    val (alignedA, schemaA) = Normalize.alignToSchema(dropA, base)
    assert(schemaA == base)
    val rowA = alignedA.head()
    assert(rowA.getAs[String]("tool") == null && rowA.getAs[java.sql.Timestamp]("ts") == null)

    // drop_b: new column lang -> appended with a fresh field id
    val dropB = Seq(("c1", "0", "user", "hi", "b", "es"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "lang")
    val (_, schemaB) = Normalize.alignToSchema(dropB, base)
    assert(schemaB.fields.last.name == "lang" && schemaB.lastFieldId == base.lastFieldId + 1)

    // drop_c: same columns, different order + padded names -> field-ID align
    val dropC = Seq(("es", "hi", "0", "c1"))
      .toDF(" lang ", "text", "turn_idx", " conv_id ")
    val (alignedC, schemaC) = Normalize.alignToSchema(dropC, schemaB)
    assert(schemaC == schemaB, "re-seen columns must not allocate new field ids")
    val rowC = alignedC.head()
    assert(rowC.getAs[String]("conv_id") == "c1" && rowC.getAs[String]("lang") == "es")
    assert(alignedC.columns.take(6).toSeq == schemaB.fieldNames.take(6))

    // cast-failure routing: bad turn_idx quarantines instead of erroring
    val dropBad = Seq(("c1", "NaN!", "user", "hi")).toDF("conv_id", "turn_idx", "role", "text")
    val (alignedBad, _) = Normalize.alignToSchema(dropBad, base)
    val (valid, rejected) = Normalize.routeInvalid(alignedBad)
    assert(valid.isEmpty && rejected.count() == 1)
  }

  test("alignToSchema dedupes post-trim colliding columns (last value wins)") {
    import spark.implicits._
    val base = TableSchema.fromStruct(TranscriptSynth.schema)
    // "note" and "note " trim to the same name — one evolved field, the
    // LAST occurrence's value wins (DictReader parity)
    val drop = Seq(("c1", "0", "user", "hi", "first", "second"))
      .toDF("conv_id", "turn_idx", "role", "text", "note", " note ")
    val (aligned, evolved) = Normalize.alignToSchema(drop, base)
    assert(evolved.fieldNames.count(_ == "note") == 1)
    assert(evolved.lastFieldId == base.lastFieldId + 1)
    assert(aligned.head().getAs[String]("note") == "second")
    assert(aligned.head().getAs[String]("text") == "hi")
  }
}
