package graft

import java.nio.file.Files
import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.sinks.{Report, Xlsx}

/** K7/R6/K6: the reporting sinks. The HTML body and the XLSX encoding
  * are real (verified by re-parsing); only the SMTP socket is an
  * injected transport, like Fetch's HTTP.
  */
class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("R6 toDictRows is pandas to_dict(split): stringified, null-safe, capped") {
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "v")
    val (cols, rows) = Report.toDictRows(df)
    assert(cols == Seq("id", "v"))
    assert(rows.toSet == Set(Seq("1", "a"), Seq("2", "")))
    intercept[IllegalArgumentException] {
      Report.toDictRows(spark.range(100).toDF("id"), maxRows = 10)
    }
  }

  test("K7 email body renders escaped rows; the empty frame gets the no-findings row") {
    val nulos = Seq(("proceso <x>", 3L)).toDF("proceso", "nulos")
    val html = Report.genEmail(nulos, "Nulos & faltantes", "No se encontraron nulos")
    assert(html.contains("proceso &lt;x&gt;"))
    assert(html.contains("Nulos &amp; faltantes"))
    assert(!html.contains("proceso <x>")) // raw injection never survives
    val empty = Report.genEmail(nulos.where($"nulos" < 0), "t", "No se encontraron nulos")
    assert(empty.contains("No se encontraron nulos"))
    // the send seam hands the rendered document to the injected transport
    val sent = mutable.Buffer.empty[(String, Seq[String], String)]
    Report.sendEmail(nulos, "asunto", Seq("a@b.cl"),
      (s, d, h) => sent += ((s, d, h)))
    assert(sent.size == 1 && sent.head._1 == "asunto" &&
      sent.head._2 == Seq("a@b.cl") && sent.head._3.contains("&lt;x&gt;"))
  }

  test("K6 multi-sheet workbook round-trips through an independent XML parse") {
    val seg1 = Seq((1L, "ana@x.cl", 4.5), (2L, "bo&bo@x.cl", 3.0)).toDF("id", "email", "score")
    val seg2 = Seq((9L, "zoe@x.cl", 1.25)).toDF("id", "email", "score")
    val path = Files.createTempDirectory("graft-xlsx").toString + "/segments.xlsx"
    Xlsx.writeWorkbook(path, Seq("rutasecreta" -> seg1, "cocavi" -> seg2))

    val zf = new ZipFile(path)
    try {
      // the minimal valid part set is present
      val names = zf.stream().map(_.getName).toArray.map(_.toString).toSet
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/styles.xml",
        "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml").subsetOf(names))
      def parse(entry: String) = {
        val dbf = DocumentBuilderFactory.newInstance()
        dbf.setNamespaceAware(true)
        dbf.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(entry)))
      }
      // sheet tabs carry the segment names in order
      val wb = parse("xl/workbook.xml")
      val sheetEls = wb.getElementsByTagNameNS("*", "sheet")
      assert((0 until sheetEls.getLength).map(i =>
        sheetEls.item(i).getAttributes.getNamedItem("name").getNodeValue) ==
        Seq("rutasecreta", "cocavi"))
      // cell values reconstruct the frame: header + typed cells
      val s1 = parse("xl/worksheets/sheet1.xml")
      val cells = s1.getElementsByTagNameNS("*", "c")
      val byRef = (0 until cells.getLength).map { i =>
        val c = cells.item(i)
        c.getAttributes.getNamedItem("r").getNodeValue -> c.getTextContent
      }.toMap
      assert(byRef("A1") == "id" && byRef("B1") == "email" && byRef("C1") == "score")
      assert(byRef("B3") == "bo&bo@x.cl") // escaping round-trips
      assert(byRef("C2") == "4.5" && byRef("A3") == "2")
      // numeric columns are native number cells (no inline-string type)
      val c2 = (0 until cells.getLength).map(cells.item).find(
        _.getAttributes.getNamedItem("r").getNodeValue == "C2").get
      assert(c2.getAttributes.getNamedItem("t") == null)
      // string columns are inline strings
      val b2 = (0 until cells.getLength).map(cells.item).find(
        _.getAttributes.getNamedItem("r").getNodeValue == "B2").get
      assert(b2.getAttributes.getNamedItem("t").getNodeValue == "inlineStr")
    } finally zf.close()
  }

  test("K6 the segment workbook: one sheet per exclusive segment (the Bigquery_to_csv flow)") {
    val memberships = Seq(
      ("rutasecreta", "a@x.cl"), ("historiafreak", "a@x.cl"), // a claimed by priority 1
      ("historiafreak", "b@x.cl"), ("cocavi", "c@x.cl")
    ).toDF("tag", "member")
    val excl = graft.operators.Segmentation.exclusive(
      memberships, Seq("rutasecreta", "historiafreak", "cocavi"))
    val tags = excl.select("tag").distinct().as[String].collect().sorted.toSeq
    val path = Files.createTempDirectory("graft-xlsx2").toString + "/mailing.xlsx"
    Xlsx.writeWorkbook(path,
      tags.map(t => t -> excl.where($"tag" === t).select("member").orderBy("member")))
    val zf = new ZipFile(path)
    try {
      val sheets = (1 to tags.size).map(i => s"xl/worksheets/sheet$i.xml")
      assert(sheets.forall(s => zf.getEntry(s) != null))
    } finally zf.close()
  }
}
