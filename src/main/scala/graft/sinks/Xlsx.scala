package graft.sinks

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** K6: a real Excel sink, dependency-free. XLSX is a zip of
  * SpreadsheetML parts; this writes the minimal valid workbook —
  * [Content_Types].xml, the package/workbook relationships, a stub
  * styles part, and one worksheet per sheet — with inline-string cells
  * (no sharedStrings table needed) and native number cells for numeric
  * columns. Verified against external readers in the spec by unzipping
  * and XML-parsing the parts back.
  *
  * The reference's usage is `df.to_excel(excel_writer, sheet_name=...)`
  * per mailing segment into one workbook (Bigquery_to_csv_2.ipynb:27,
  * 119; email_catalogo.py) — driver-sized output by construction, so
  * the collect is capped like Report.toDictRows. Dates/timestamps land
  * as ISO-8601 inline strings (the portable choice — Excel serial-date
  * styling is presentation, not data).
  */
object Xlsx {

  private def colRef(i: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA ... (Excel base-26 with no zero digit)
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def escXml(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
    case c => c.toString
  }

  private val NumericTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  private def sheetXml(df: DataFrame, maxRows: Int): String = {
    val (cols, _) = (df.columns.toSeq, ())
    val numeric = df.schema.fields.map(f =>
      NumericTypes.contains(f.dataType) || f.dataType.isInstanceOf[DecimalType])
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"sheet exceeds $maxRows rows — Excel export is for report-sized data")
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def cell(ref: String, v: String, isNum: Boolean): String =
      if (v == null) ""
      else if (isNum) s"""<c r="$ref"><v>${escXml(v)}</v></c>"""
      else s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escXml(v)}</t></is></c>"""
    sb ++= cols.zipWithIndex.map { case (c, i) => cell(s"${colRef(i)}1", c, isNum = false) }
      .mkString("""<row r="1">""", "", "</row>")
    rows.zipWithIndex.foreach { case (r, ri) =>
      val rn = ri + 2
      sb ++= cols.indices.map { i =>
        if (r.isNullAt(i)) ""
        else cell(s"${colRef(i)}$rn", String.valueOf(r.get(i)), numeric(i))
      }.mkString(s"""<row r="$rn">""", "", "</row>")
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  /** Write `sheets` as one workbook at `path` (the reference's one
    * sheet per segment). Sheet names are deduplicated Excel-style
    * constraints are the caller's concern; tabs keep insertion order.
    */
  def writeWorkbook(path: String, sheets: Seq[(String, DataFrame)],
                    maxRowsPerSheet: Int = 100000): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      val n = sheets.size
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString + "</Types>")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${escXml(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString +
        "</sheets></workbook>")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString +
        s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
        "</Relationships>")
      put("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>""" +
        """<fills count="1"><fill><patternFill patternType="none"/></fill></fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
        """<cellXfs count="1"><xf xfId="0"/></cellXfs>""" +
        "</styleSheet>")
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df, maxRowsPerSheet))
      }
    } finally zos.close()
  }
}
