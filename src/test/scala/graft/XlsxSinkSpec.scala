package graft

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.XlsxSink

/** S6: the binary .xlsx sink must produce a valid OOXML package — verified
  * by unzipping with the JDK and parsing the worksheet with the JDK's
  * namespace-aware XML parser (no spreadsheet library exists in this
  * container, which is exactly why the sink hand-writes the five parts). */
class XlsxSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-xlsx-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("colRef follows A1 notation incl. the AA rollover") {
    assert(XlsxSink.colRef(0) == "A")
    assert(XlsxSink.colRef(25) == "Z")
    assert(XlsxSink.colRef(26) == "AA")
    assert(XlsxSink.colRef(27) == "AB")
    assert(XlsxSink.colRef(51) == "AZ")
    assert(XlsxSink.colRef(52) == "BA")
    assert(XlsxSink.colRef(701) == "ZZ")
    assert(XlsxSink.colRef(702) == "AAA")
  }

  test("writeXlsx emits a well-formed package whose cells round-trip") {
    import spark.implicits._
    val df = Seq(
      ("ACTION NO 1 OF 2020", "WONG <T> & \"M\"", "高等法院原訟法庭", "HK$1,000"),
      ("民事訴訟 2018 年第 1810 號", null, "multi\nline", "")
    ).toDF("case_number", "plaintiff", "court_name", "claim_amount")

    val file = java.nio.file.Files.createTempDirectory("xlsx").resolve("out.xlsx").toString
    XlsxSink.writeXlsx(df, file)

    val zip = new ZipFile(file)
    try {
      val names = {
        val e = zip.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      assert(names.toSet == Set("[Content_Types].xml", "_rels/.rels",
        "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
        "xl/worksheets/sheet1.xml"))

      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      // every part must parse as XML
      names.foreach { n =>
        dbf.newDocumentBuilder().parse(zip.getInputStream(zip.getEntry(n)))
      }
      val sheet = dbf.newDocumentBuilder()
        .parse(zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml")))
      val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
      val rowNodes = sheet.getElementsByTagNameNS(ns, "row")
      assert(rowNodes.getLength == 3) // header + 2 records

      def rowValues(i: Int): Map[String, String] = {
        val cells = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagNameNS(ns, "c")
        (0 until cells.getLength).map { j =>
          val c = cells.item(j).asInstanceOf[org.w3c.dom.Element]
          val t = c.getElementsByTagNameNS(ns, "t").item(0)
          c.getAttribute("r") -> (if (t == null) "" else t.getTextContent)
        }.toMap
      }
      assert(rowValues(0) == Map("A1" -> "case_number", "B1" -> "plaintiff",
        "C1" -> "court_name", "D1" -> "claim_amount"))
      val r2 = rowValues(1)
      assert(r2("A2") == "ACTION NO 1 OF 2020")
      assert(r2("B2") == "WONG <T> & \"M\"") // XML-escaped then parsed back
      assert(r2("C2") == "高等法院原訟法庭")
      val r3 = rowValues(2)
      assert(r3("A3") == "民事訴訟 2018 年第 1810 號")
      assert(!r3.contains("B3")) // null cell omitted, like an empty pandas cell
      assert(r3("C3") == "multi\nline") // xml:space="preserve" keeps the newline
      assert(r3("D3") == "")
    } finally zip.close()
  }
}
