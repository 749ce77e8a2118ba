package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable

/** Minimal `.xlsx` ingestion — the reference's upsert flow accepts
  * Excel uploads and merges them into the registry
  * (`eni_uat_backend_code/app.py:6063-6300`, pandas `read_excel`).
  * No POI/spark-excel jar exists offline, but xlsx is only a zip of
  * XML, so this parses it with JDK-only machinery: `java.util.zip`
  * for the container, namespace-aware DOM for `xl/sharedStrings.xml`
  * and the first worksheet.
  *
  * Deliberately DRIVER-SIDE: an uploaded workbook is KBs–MBs of
  * operator input, not lake data — parsing it on the driver and
  * parallelizing the rows is the honest shape (the distributed part
  * of the upsert flow is the MERGE itself, covered by q29). Cells
  * surface as nullable strings (header row = column names), matching
  * the stringly-typed spreadsheet reality; callers cast.
  *
  * Supported cell forms: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula/literal strings (`t="str"`), and
  * untyped numerics. Gaps become nulls via the `r="B2"` coordinates.
  */
object ExcelReader {

  def excel(s: SparkSession, path: String): DataFrame = {
    val rows = parseRows(path)
    require(rows.nonEmpty, s"$path: no rows in first worksheet")
    val header = rows.head.map(v => Option(v).getOrElse(""))
    val width = header.length
    val data = rows.tail.map { r =>
      Row.fromSeq(r.padTo(width, null).take(width).toSeq)
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    s.createDataFrame(new java.util.ArrayList[Row](
      java.util.Arrays.asList(data: _*)), schema)
  }

  /** All cell values of the first worksheet, row-major, null for gaps. */
  private def parseRows(path: String): Array[Array[String]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Array.empty[String])
      // the FIRST sheet is the first <sheet> in workbook.xml resolved
      // through the rels map — NOT the lexicographically-first part
      // name (after tab reorders/deletions Excel keeps original part
      // names, so sheet2.xml can be the visible first tab, and
      // sheet10.xml sorts before sheet2.xml). Fall back to name order
      // only when the workbook parts are absent (our own minimal
      // test fixtures).
      val sheetName = firstSheetTarget(zip).getOrElse {
        import scala.jdk.CollectionConverters._
        zip.entries().asScala
          .filter(_.getName.matches("xl/worksheets/sheet\\d+\\.xml"))
          .toSeq.sortBy(_.getName).headOption.map(_.getName)
          .getOrElse(throw new IllegalArgumentException(s"$path: no worksheet"))
      }
      val sheetEntry = Option(zip.getEntry(sheetName))
        .getOrElse(throw new IllegalArgumentException(s"$path: missing $sheetName"))
      parseSheet(zip.getInputStream(sheetEntry), shared)
    } finally zip.close()
  }

  private def newDoc(in: java.io.InputStream): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // uploaded content: no DTDs, no external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(in)
  }

  private def parseSharedStrings(in: java.io.InputStream): Array[String] = {
    val doc = newDoc(in)
    val sis = doc.getElementsByTagName("si")
    Array.tabulate(sis.getLength) { i =>
      // concat all <t> descendants (plain or rich-text runs)
      val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("t")
      (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
    }
  }

  private def parseSheet(in: java.io.InputStream,
                         shared: Array[String]): Array[Array[String]] = {
    val doc = newDoc(in)
    val rowNodes = doc.getElementsByTagName("row")
    val out = mutable.ArrayBuffer.empty[Array[String]]
    var maxWidth = 0
    (0 until rowNodes.getLength).foreach { ri =>
      val cells = rowNodes.item(ri).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("c")
      val row = mutable.ArrayBuffer.empty[String]
      (0 until cells.getLength).foreach { ci =>
        val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
        val ref = colIndex(c.getAttribute("r"))
        val idx = if (ref < 0) row.length else ref // no coordinate: append
        while (row.length < idx) row += null
        row += cellValue(c, shared)
      }
      maxWidth = math.max(maxWidth, row.length)
      out += row.toArray
    }
    out.map(_.padTo(maxWidth, null)).toArray
  }

  /** workbook.xml's first <sheet r:id> resolved through
    * xl/_rels/workbook.xml.rels to a worksheet part name.
    */
  private def firstSheetTarget(zip: java.util.zip.ZipFile): Option[String] =
    for {
      wbEntry <- Option(zip.getEntry("xl/workbook.xml"))
      relEntry <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
      wb = newDoc(zip.getInputStream(wbEntry))
      sheets = wb.getElementsByTagName("sheet")
      if sheets.getLength > 0
      rid = sheets.item(0).asInstanceOf[org.w3c.dom.Element]
        .getAttributeNS(
          "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
          "id") match {
          case "" => sheets.item(0).asInstanceOf[org.w3c.dom.Element]
            .getAttribute("r:id") // non-namespace-aware writers
          case v => v
        }
      rels = newDoc(zip.getInputStream(relEntry))
      target <- {
        val ns = rels.getElementsByTagName("Relationship")
        (0 until ns.getLength).map(ns.item(_).asInstanceOf[org.w3c.dom.Element])
          .find(_.getAttribute("Id") == rid)
          .map(_.getAttribute("Target"))
          .map(t => if (t.startsWith("/")) t.drop(1) else s"xl/$t")
      }
    } yield target

  private def cellValue(c: org.w3c.dom.Element, shared: Array[String]): String = {
    def firstText(tag: String): Option[String] = {
      val ns = c.getElementsByTagName(tag)
      if (ns.getLength > 0) Some(ns.item(0).getTextContent) else None
    }
    // rich-text cells split the value over several <t> runs — concat
    // them all (like parseSharedStrings), never just the first
    def allText(tag: String): Option[String] = {
      val ns = c.getElementsByTagName(tag)
      if (ns.getLength == 0) None
      else Some((0 until ns.getLength).map(ns.item(_).getTextContent).mkString)
    }
    c.getAttribute("t") match {
      case "s" => firstText("v").map(v => decodeX(shared(v.trim.toInt))).orNull
      case "inlineStr" => allText("t").map(decodeX).orNull
      case _ => firstText("v").map(decodeX).orNull // "str", numerics, booleans
    }
  }

  private val XEnc = "_x([0-9A-Fa-f]{4})_".r

  /** OOXML `_xHHHH_` decoding (writers — ours included — encode XML-
    * illegal control chars this way; `_x005F_` is an escaped literal
    * underscore). Left-to-right non-overlapping replacement makes
    * `_x005F_x0041_` decode to the literal `_x0041_` correctly.
    */
  private def decodeX(s: String): String =
    if (!s.contains("_x")) s
    else XEnc.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      Integer.parseInt(m.group(1), 16).toChar.toString))

  /** "BC7" → 0-based column 54; -1 when the cell has no coordinate. */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) -1
    else letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
  }
}
