package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Id-keyed record merge — the reference's `_group_records_by_id`
  * (backend/app/services/csv_handler.py:66-97), the semantic core of the
  * engine's MERGE INTO:
  *   - the id field name arrives possibly padded -> trimmed;
  *   - records with missing/empty id pass through unmerged, in place;
  *   - the first occurrence of an id fixes the output position;
  *   - later records overwrite field-by-field with NON-EMPTY values only
  *     ("" and null never clobber, csv_handler.py:91-95).
  *
  * Deterministic aggregation: "last non-empty" is expressed as
  * max(struct(ord, value)) over non-empty rows — struct max orders by the
  * leading ord field, so results don't depend on shuffle row order the way
  * a bare `last(ignoreNulls)` would.
  */
object Grouping {

  /** Last non-empty value of `c` by `ord`; falls back to the first-seen
    * value when every occurrence is empty.
    */
  def lastNonEmptyWins(c: Column, ord: Column): Column = {
    val nonEmpty = c.isNotNull && c =!= ""
    coalesce(
      max(when(nonEmpty, struct(ord.as("o"), c.as("v")))).getField("v"),
      min(struct(ord.as("o"), c.as("v"))).getField("v"))
  }

  /** Typed-column variant: null never clobbers, but "" has no meaning for
    * non-string types (comparing ts/int to "" would ANSI-error).
    */
  def lastNonNullWins(c: Column, ord: Column): Column =
    coalesce(
      max(when(c.isNotNull, struct(ord.as("o"), c.as("v")))).getField("v"),
      min(struct(ord.as("o"), c.as("v"))).getField("v"))

  /** Merge `df` records sharing `idField` (all-string columns), preserving
    * reference position semantics. `ordCol` must be a strictly increasing
    * record order (e.g. line number within the drop).
    */
  def groupRecordsById(df: DataFrame, idField: Option[String], ordCol: String): DataFrame = {
    val cleanId = idField.map(_.trim).filter(_.nonEmpty)
    cleanId match {
      case None => df
      case Some(id) if !df.columns.contains(id) => df
      case Some(id) =>
        val dataCols = df.columns.filterNot(_ == ordCol).toIndexedSeq
        val ord = col(ordCol)
        val validId = col(id).isNotNull && col(id) =!= ""

        val merged = df.where(validId)
          .groupBy(col(id))
          .agg(min(ord).as(ordCol),
            dataCols.filterNot(_ == id)
              .map(c => lastNonEmptyWins(col(c), ord).as(c)): _*)
          .select((ordCol +: dataCols).map(col): _*)

        val passthrough = df.where(!validId || col(id).isNull)
          .select((ordCol +: dataCols).map(col): _*)

        merged.unionByName(passthrough)
          .orderBy(ordCol)
          .select(dataCols.map(col): _*)
    }
  }
}
