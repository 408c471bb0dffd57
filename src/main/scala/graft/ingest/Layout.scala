package graft.ingest

/** Layout classification: horizontal table vs vertical key-value stream.
  * Port of the reference heuristic (backend/app/services/csv_handler.py:32-63):
  * on the first 20 rows of a 4 KB sample (non-strict parse), vertical iff
  * average row width <= 2.5 AND first-column duplication ratio > 0.3.
  * Driver-side O(1) work per drop.
  */
object Layout {

  val SampleSize = 4096
  val SampleRows = 20

  def isVerticalLayout(content: String, dialect: Dialect): Boolean = {
    val sample = content.substring(0, math.min(SampleSize, content.length))
    // Python iterates `next(reader)` 20 times catching csv.Error/StopIteration
    // — a parse error mid-iteration keeps the rows read so far. Non-strict.
    val rows =
      try StrictCsv.parse(sample, dialect.delimiter, dialect.quote,
        strict = false, maxRows = SampleRows)
      catch { case _: Exception => Vector.empty }
    val nonEmpty = rows.take(SampleRows).filter(_.nonEmpty)
    if (nonEmpty.isEmpty) return false

    val avgWidth = nonEmpty.map(_.length).sum.toDouble / nonEmpty.size
    if (avgWidth > 2.5) return false

    val firstCol = nonEmpty.map(_.head)
    val duplicationRatio = 1.0 - firstCol.distinct.size.toDouble / firstCol.size
    duplicationRatio > 0.3
  }
}
