package graft.sources

import org.apache.spark.sql.DataFrame
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal `.xlsx` export — the reference's most-used download path
  * (`eni_uat_backend_code/app.py:7379-7486`, `ExportToExcel`: query
  * results → openpyxl workbook → browser download). Mirror of
  * ExcelReader: no POI/spark-excel jar exists offline, but xlsx is a
  * zip of XML, so this emits the minimal valid OOXML container with
  * `java.util.zip` — [Content_Types].xml, the package/workbook rels,
  * one worksheet — nothing else.
  *
  * Deliberately DRIVER-SIDE, like the reader: an exported report is
  * KBs–MBs of operator OUTPUT (the reference streams it to a browser),
  * not lake data — rows stream through `toLocalIterator` so only one
  * partition is resident, and the cap guards against someone pointing
  * a corpus-sized DataFrame at a spreadsheet (Excel itself stops at
  * 1,048,576 rows). Lake-scale exports are the parquet/ORC/Avro
  * writers.
  *
  * Cell typing: numeric columns become untyped `<v>` cells (what
  * spreadsheet tools write for numbers), everything else inline
  * strings (`t="inlineStr"`, XML-escaped), nulls become gap cells
  * (coordinate skipped) — exactly the forms ExcelReader parses, so
  * write → read round-trips losslessly as strings.
  */
object ExcelWriter {

  val ExcelMaxRows: Int = 1048576 // hard sheet limit in the format

  def writeExcel(df: DataFrame, path: String,
                 maxRows: Int = ExcelMaxRows - 1): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    var complete = false
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      def w(sxml: String): Unit = zos.write(sxml.getBytes("UTF-8"))
      w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")

      val numeric = df.schema.fields.map(f => f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case _ => false
      })
      // header row: column names as inline strings
      w(rowXml(1, df.columns.zipWithIndex.map {
        case (name, ci) => inlineCell(ci, 1, name)
      }))
      var rn = 1
      val it = df.toLocalIterator()
      while (it.hasNext && rn - 1 < maxRows) {
        val row = it.next(); rn += 1
        val cells = (0 until row.length).flatMap { ci =>
          if (row.isNullAt(ci)) None // gap cell
          else if (numeric(ci)) {
            // NaN/Infinity are not legal xlsx numeric cells (Excel
            // rejects the whole workbook); fall back to inline text
            val v = row.get(ci)
            val finite = v match {
              case d: java.lang.Double => !d.isNaN && !d.isInfinite
              case f: java.lang.Float => !f.isNaN && !f.isInfinite
              case _ => true
            }
            if (finite) Some(s"""<c r="${ref(ci, rn)}"><v>$v</v></c>""")
            else Some(inlineCell(ci, rn, String.valueOf(v)))
          }
          else Some(inlineCell(ci, rn, String.valueOf(row.get(ci))))
        }
        w(rowXml(rn, cells))
      }
      require(!it.hasNext,
        s"$path: DataFrame exceeds $maxRows rows — xlsx is a report " +
          "format; use the parquet/ORC/Avro writers for lake-scale data")
      w("</sheetData></worksheet>")
      zos.closeEntry()
      complete = true
    } finally {
      zos.close()
      // a failure mid-stream (row cap, IO error) would otherwise leave
      // a VALID zip with a truncated sheet — a corrupt workbook a
      // retrying caller could serve as if complete. Delete it.
      if (!complete) new java.io.File(path).delete()
    }
  }

  private def rowXml(rn: Int, cells: Seq[String]): String =
    cells.mkString(s"""<row r="$rn">""", "", "</row>")

  private def inlineCell(ci: Int, rn: Int, v: String): String =
    s"""<c r="${ref(ci, rn)}" t="inlineStr"><is><t>${escape(v)}</t></is></c>"""

  /** 0-based column 54, row 7 → "BC7" (inverse of ExcelReader.colIndex). */
  private def ref(ci: Int, rn: Int): String = {
    var n = ci + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.append(rn).toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** True when index i starts a literal `_xHHHH_` lookalike. */
  private def isLookalike(s: String, i: Int): Boolean =
    i + 6 < s.length && s.charAt(i) == '_' && s.charAt(i + 1) == 'x' &&
      isHex(s.charAt(i + 2)) && isHex(s.charAt(i + 3)) &&
      isHex(s.charAt(i + 4)) && isHex(s.charAt(i + 5)) && s.charAt(i + 6) == '_'

  private def escape(s: String): String = {
    // control chars below 0x20 (except \t \n \r) are ILLEGAL in XML
    // 1.0 even as entities — emitted raw they'd make the sheet
    // unparseable by any reader. OOXML's convention encodes them as
    // _xHHHH_; consequently a LITERAL _xHHHH_ in the data gets its
    // leading underscore escaped (_x005F_x…) so the decoder
    // (ExcelReader.decodeX) is unambiguous. One manual scan, not a
    // regex pre-pass: overlapping lookalikes share an underscore
    // ("_x0041_x0042_") and non-overlapping regex replacement would
    // miss the second, corrupting the round-trip.
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') { sb.append("&amp;"); i += 1 }
      else if (c == '<') { sb.append("&lt;"); i += 1 }
      else if (c == '>') { sb.append("&gt;"); i += 1 }
      else if (c == '"') { sb.append("&quot;"); i += 1 }
      else if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') {
        sb.append(f"_x${c.toInt}%04X_"); i += 1
      } else if (isLookalike(s, i)) {
        sb.append("_x005F_x"); i += 2 // the escaped leading "_x"
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
