package graft.report

import java.io.OutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal streaming XLSX (ECMA-376 SpreadsheetML) writer — no Apache POI,
  * no dependency beyond `java.util.zip`: an .xlsx file is a ZIP of XML
  * parts, and the error-report workbook needs only sheets of text/number
  * cells. Cells are written as inline strings (no shared-strings table) so
  * a sheet streams row by row at constant memory; worksheet parts are
  * written first and the workbook manifest (which must list every sheet)
  * is emitted at `close()`, so the number of sheets — e.g. overflow splits
  * — need not be known up front.
  *
  * This is the render half of the reference's openpyxl report
  * (ref: reporting/excel_report.py:24-345); the layout logic lives in
  * [[ErrorSink.writeExcelReport]].
  */
final class XlsxWriter(out: OutputStream) {

  private val zip = new ZipOutputStream(out, UTF_8)
  private val sheetNames = scala.collection.mutable.ArrayBuffer.empty[String]
  private var closed = false

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** XML 1.0 forbids most control characters; the reference replaces an
    * offending CELL with this marker (ref: excel_report.py:285-288).
    */
  private def sanitize(s: String): String =
    if (s.exists(c => c < ' ' && c != '\t' && c != '\n' && c != '\r'))
      "Illegal unicode character"
    else s

  private def cellXml(v: Any): String = v match {
    case null => "<c/>"
    case None => "<c/>"
    case n @ (_: Long | _: Int | _: Short | _: Byte) => s"""<c t="n"><v>$n</v></c>"""
    case d: Double if !d.isNaN && !d.isInfinite => s"""<c t="n"><v>$d</v></c>"""
    case other =>
      s"""<c t="inlineStr"><is><t xml:space="preserve">${esc(sanitize(other.toString))}</t></is></c>"""
  }

  /** Stream one worksheet. Sheet order in the workbook = call order. */
  def writeSheet(name: String, rows: Iterator[Seq[Any]],
                 freezeHeader: Boolean = false): Unit = {
    require(!closed, "writer is closed")
    sheetNames += name
    val idx = sheetNames.size
    zip.putNextEntry(new ZipEntry(s"xl/worksheets/sheet$idx.xml"))
    def w(s: String): Unit = zip.write(s.getBytes(UTF_8))
    w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""")
    if (freezeHeader)
      w("""<sheetViews><sheetView workbookViewId="0">""" +
        """<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/>""" +
        """</sheetView></sheetViews>""")
    w("<sheetData>")
    rows.foreach { row =>
      w("<row>")
      row.foreach(c => w(cellXml(c)))
      w("</row>")
    }
    w("</sheetData></worksheet>")
    zip.closeEntry()
  }

  /** Emit the workbook manifest parts and finish the ZIP. */
  def close(): Unit = {
    if (closed) return
    closed = true
    def part(path: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(path))
      zip.write(content.getBytes(UTF_8))
      zip.closeEntry()
    }
    val n = sheetNames.size
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString +
        "</Types>")
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheetNames.zipWithIndex.map { case (name, i) =>
          s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        "</sheets></workbook>")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString +
        "</Relationships>")
    zip.close()
  }
}
