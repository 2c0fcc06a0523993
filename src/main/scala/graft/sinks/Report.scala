package graft.sinks

import org.apache.spark.sql.DataFrame

/** Reporting surface (SURVEY §2.2 K7 / §2.12 R6): the reference's
  * data-quality emails render a small query result into an HTML table
  * via `df.to_dict(orient='split')` + string templating and hand it to
  * SMTP (email_nulos.py:49-325, email_seguimiento.py:60-128).
  *
  * The rendering and dict-reshape are pure computation, implemented for
  * real here; the SMTP transport is an injected seam exactly like
  * Fetch's HTTP transport (no network in this environment, and a
  * library should not own SMTP credentials anyway).
  *
  * Reports are driver-sized BY CONSTRUCTION (a human reads the email) —
  * `toDictRows` enforces that with a hard cap instead of letting an
  * unbounded collect take down the driver on a mis-wired input.
  */
object Report {

  /** R6: pandas `to_dict(orient='split')` — (columns, rows-as-lists),
    * everything stringified, NULL → empty string (what the reference's
    * `.format` templating renders for None). Caps the collect.
    */
  def toDictRows(df: DataFrame, maxRows: Int = 10000): (Seq[String], Seq[Seq[String]]) = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"report exceeds $maxRows rows — reporting queries must aggregate first")
    (df.columns.toSeq,
      rows.toSeq.map(r => df.columns.indices.map(i =>
        if (r.isNullAt(i)) "" else String.valueOf(r.get(i)))))
  }

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  /** The reference's row loop (email_nulos.py:58-75): one styled <tr>
    * per to_dict row, or the "no findings" row for an empty frame —
    * with HTML escaping the reference's raw `.format` lacks.
    */
  def htmlTable(df: DataFrame, emptyMessage: String, maxRows: Int = 10000): String = {
    val (cols, rows) = toDictRows(df, maxRows)
    if (rows.isEmpty)
      s"""<tr style="border: 1px;"><td>${esc(emptyMessage)}</td></tr>"""
    else {
      val header = cols.map(c => s"""<th style="text-align: left;">${esc(c)}</th>""")
        .mkString("<tr>", "", "</tr>")
      val body = rows.map(_.map(v =>
          s"""<td style="vertical-align: middle; padding-bottom: 5px; font-size: 18px; font-weight: bold;">${esc(v)}</td>""")
          .mkString("""<tr style="border: 1px;">""", "", "</tr>"))
        .mkString("\n")
      header + "\n" + body
    }
  }

  /** The full email document (the reference wraps the rows in a ~250
    * line Outlook-proofed MJML export; the contract is "valid HTML
    * email with the title and the table", which this is).
    */
  def genEmail(df: DataFrame, title: String, emptyMessage: String,
               maxRows: Int = 10000): String =
    s"""<!doctype html>
       |<html>
       |<head><meta http-equiv="Content-Type" content="text/html; charset=UTF-8"><title>${esc(title)}</title></head>
       |<body>
       |<h2>${esc(title)}</h2>
       |<table style="border-collapse: collapse;">
       |${htmlTable(df, emptyMessage, maxRows)}
       |</table>
       |</body>
       |</html>""".stripMargin

  /** K7: the send seam. `transport` is (subject, destinations, html) —
    * a production deployment injects SMTP here (email_nulos.py:312-325);
    * tests inject a recorder. The sentinel-flag alternative for
    * machine-to-machine signalling is `pipelines.Runner.report`.
    */
  def sendEmail(df: DataFrame, subject: String, dest: Seq[String],
                transport: (String, Seq[String], String) => Unit,
                emptyMessage: String = "No se encontraron nulos"): Unit =
    transport(subject, dest, genEmail(df, subject, emptyMessage))
}
