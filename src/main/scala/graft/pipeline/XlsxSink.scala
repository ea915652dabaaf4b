package graft.pipeline

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** S6 — a TRUE binary `.xlsx` sink for the records table, closing the
  * reference's `df.to_excel(...)` surface (`/root/reference/src/processor.py:172-177`,
  * pandas + openpyxl). No spreadsheet library is needed: an `.xlsx` is a
  * ZIP (`java.util.zip`, in the JDK) of five small OOXML parts —
  * `[Content_Types].xml`, the package/workbook relationship files,
  * `xl/workbook.xml`, and one worksheet. Cells are written as inline
  * strings (`t="inlineStr"`), matching the reference's data: every record
  * field is a string (SURVEY.md §1.2) — so no sharedStrings table and no
  * type inference is required.
  *
  * Driver-side single file, like the reference's own sink (pandas
  * materializes the whole frame); small result sets only — use
  * [[RecordsSink.writeCsv]] for bulk. Sheet name "Sheet1" mirrors
  * pandas' default. */
object XlsxSink {

  /** A1-style column reference: 0 -> A, 25 -> Z, 26 -> AA ... */
  private[graft] def colRef(index: Int): String = {
    var n = index
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // literal control chars are invalid in XML 1.0 text; strip like
      // openpyxl's ILLEGAL_CHARACTERS_RE does
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val packageRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val workbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>""".stripMargin

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** Write `records` (header row + one row per record, all cells as
    * strings — null renders empty, non-strings via toString) to `file`. */
  def writeXlsx(records: DataFrame, file: String): Unit = {
    val cols = records.columns
    val rows = records.collect()

    val sheet = new StringBuilder(1 << 16)
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append('\n')
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""")
      .append("<sheetData>")
    def appendRow(r: Int, values: Seq[String]): Unit = {
      sheet.append(s"""<row r="$r">""")
      values.zipWithIndex.foreach { case (v, c) =>
        if (v != null)
          sheet.append(s"""<c r="${colRef(c)}$r" t="inlineStr"><is><t xml:space="preserve">""")
            .append(esc(v)).append("</t></is></c>")
      }
      sheet.append("</row>")
    }
    appendRow(1, cols.toSeq)
    rows.zipWithIndex.foreach { case (row, i) =>
      appendRow(i + 2, cols.indices.map(j => Option(row.get(j)).map(_.toString).orNull))
    }
    sheet.append("</sheetData></worksheet>")

    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
    try {
      def part(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", packageRels)
      part("xl/workbook.xml", workbook)
      part("xl/_rels/workbook.xml.rels", workbookRels)
      part("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }
}
