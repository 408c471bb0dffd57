package graft.ingest

import scala.collection.mutable.{ArrayBuffer, StringBuilder => MSB}

/** RFC-4180-ish CSV tokenizer matching Python `csv.reader` behavior
  * (including `strict=True` failure modes), which the reference's dialect
  * scoring depends on (reference: backend/app/services/dialect_detector.py:100-111).
  *
  * Matched behaviors (verified against CPython 3):
  *   - strict: any char after a closing quote other than delimiter/EOL
  *     raises; non-strict appends it and degrades to an unquoted field where
  *     further quotes are literal;
  *   - strict: EOF inside a quoted field raises ("unexpected end of data");
  *     non-strict returns the partial field including raw newlines;
  *   - doubled quotechar inside a quoted field -> literal quote;
  *   - a quotechar not at field start is literal;
  *   - blank lines -> empty row `[]`; CRLF / LF / CR all terminate rows;
  *   - newlines inside quoted fields are preserved.
  */
object StrictCsv {

  final case class CsvError(msg: String) extends Exception(msg)

  def parse(content: String, delimiter: Char, quote: Char,
            strict: Boolean = true, maxRows: Int = Int.MaxValue): Vector[Vector[String]] = {
    val rows = ArrayBuffer.empty[Vector[String]]
    val fields = ArrayBuffer.empty[String]
    val sb = new MSB
    // States
    val StartField = 0; val InField = 1; val InQuoted = 2; val QuoteInQuoted = 3
    var state = StartField
    var sawAnyField = false // fields already completed in the current row
    var i = 0
    val n = content.length

    def pushField(): Unit = { fields += sb.result(); sb.clear(); sawAnyField = true }
    def pushRow(): Unit = { rows += fields.toVector; fields.clear(); sawAnyField = false }

    def atEol(idx: Int): Int = { // returns EOL length at idx, 0 if none
      val c = content.charAt(idx)
      if (c == '\n') 1
      else if (c == '\r') { if (idx + 1 < n && content.charAt(idx + 1) == '\n') 2 else 1 }
      else 0
    }

    while (i < n && rows.length < maxRows) {
      val c = content.charAt(i)
      state match {
        case StartField =>
          val eol = atEol(i)
          if (eol > 0) {
            if (sawAnyField) { pushField(); pushRow() } else pushRow() // blank line -> []
            i += eol
          } else if (c == quote) { state = InQuoted; i += 1 }
          else if (c == delimiter) { pushField(); i += 1 }
          else { sb.append(c); state = InField; i += 1 }
        case InField =>
          val eol = atEol(i)
          if (eol > 0) { pushField(); pushRow(); state = StartField; i += eol }
          else if (c == delimiter) { pushField(); state = StartField; i += 1 }
          else { sb.append(c); i += 1 } // quotes mid-field are literal
        case InQuoted =>
          if (c == quote) { state = QuoteInQuoted; i += 1 }
          else { sb.append(c); i += 1 } // newlines kept raw
        case QuoteInQuoted =>
          val eol = atEol(i)
          if (c == quote) { sb.append(quote); state = InQuoted; i += 1 }
          else if (c == delimiter) { pushField(); state = StartField; i += 1 }
          else if (eol > 0) { pushField(); pushRow(); state = StartField; i += eol }
          else if (strict) throw CsvError(s"'$delimiter' expected after '$quote'")
          else { sb.append(c); state = InField; i += 1 }
      }
    }

    // EOF
    if (rows.length < maxRows) state match {
      case InQuoted =>
        if (strict) throw CsvError("unexpected end of data")
        else { pushField(); pushRow() }
      case QuoteInQuoted => pushField(); pushRow()
      case InField => pushField(); pushRow()
      case StartField => if (sawAnyField) { pushField(); pushRow() }
    }
    rows.toVector
  }
}
