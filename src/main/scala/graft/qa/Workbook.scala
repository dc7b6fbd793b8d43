package graft.qa

import org.apache.spark.sql.DataFrame

/** XLSX workbook export — the reference's final deliverable
  * (etl_qa_run_pipeline.R:1772-1786 writes one .xlsx via openxlsx, one
  * sheet per stat family). graft long declared this client-side
  * formatting and shipped the sheets as frames ([[Qa.workbookSheets]],
  * gated as qa_workbook_pivot); this module closes the last step with
  * an ACTUAL .xlsx writer in pure JDK — the format is a ZIP of OOXML
  * parts (ECMA-376, public standard), so `ZipOutputStream` + hand-built
  * XML covers everything a QA workbook needs: multiple named sheets, a
  * header row, numeric cells, inline-string cells (no shared-strings
  * table — inline strings are valid OOXML and keep the writer
  * single-pass), XML-escaped values.
  *
  * SCALE CONTRACT: export `collect()`s each sheet on the driver — by
  * design, exactly like the reference. A workbook is a human artifact;
  * every sheet the QA pipeline produces is an already-aggregated,
  * bounded frame (per-period per-variable stats). The writer enforces
  * the boundedness loudly (`maxRows`, default the xlsx format's own
  * 1,048,576-row sheet limit) instead of letting an accidental
  * fact-table export OOM the driver. Big data goes to parquet; this
  * goes to the analyst.
  */
object Workbook {

  /** XML escape. Quote and apostrophe must be escaped too: esc() output
    * lands inside double-quoted attributes (sheet name="…") as well as
    * element text, and an unescaped '"' in an attribute makes Excel
    * reject the whole workbook.
    */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  /** A1-style column name: 0 -> A, 25 -> Z, 26 -> AA ... */
  private[qa] def colRef(i: Int): String = {
    var n = i; var s = ""
    while (n >= 0) { s = ('A' + n % 26).toChar.toString + s; n = n / 26 - 1 }
    s
  }

  /** Excel's sheet-name rules: ≤31 chars, none of []:*?/\ — sanitize
    * rather than fail (family tags like "categorical" are fine; this
    * guards caller-supplied names).
    */
  private[qa] def sheetName(raw: String): String = {
    val cleaned = raw.map(c => if ("[]:*?/\\".contains(c)) '_' else c)
    val cut = cleaned.take(31)
    if (cut.isEmpty) "Sheet" else cut
  }

  private def sheetXml(header: Seq[String],
                       rows: Seq[Seq[Any]]): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= "\n<worksheet xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\"><sheetData>"
    def cell(ref: String, v: Any): Unit = v match {
      case null => ()
      case n: Number =>
        // integral-valued doubles print without the trailing .0 Excel
        // would otherwise show as a stored artifact; NaN/Inf have no
        // xlsx numeric representation — store as inline strings
        val d = n.doubleValue()
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
          cell(ref, n.toString)
        else {
          val txt = n match {
            case _: java.lang.Double | _: java.lang.Float
                if d == math.rint(d) && math.abs(d) < 1e15 =>
              d.toLong.toString
            case _ => n.toString
          }
          sb ++= s"""<c r="$ref"><v>$txt</v></c>"""
        }
      case b: Boolean =>
        sb ++= s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        sb ++= s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">""" +
          esc(other.toString) + "</t></is></c>"
    }
    sb ++= "<row r=\"1\">"
    header.zipWithIndex.foreach { case (h, c) => cell(s"${colRef(c)}1", h) }
    sb ++= "</row>"
    rows.zipWithIndex.foreach { case (r, i) =>
      sb ++= s"""<row r="${i + 2}">"""
      r.zipWithIndex.foreach { case (v, c) =>
        cell(s"${colRef(c)}${i + 2}", v) }
      sb ++= "</row>"
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  /** Write `sheets` (name → frame, in iteration order) as one .xlsx at
    * `path`. Each frame is collected on the driver — see the scale
    * contract above; frames beyond `maxRows` fail loudly.
    */
  def writeXlsx(sheets: Seq[(String, DataFrame)], path: String,
                maxRows: Int = 1048575): Unit = {
    require(sheets.nonEmpty, "writeXlsx: a workbook needs at least one sheet")
    val names = sheets.map { case (n, _) => sheetName(n) }
    require(names.distinct.size == names.size,
      s"writeXlsx: sheet names collide after sanitization: $names")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      val n = sheets.size
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          "\n<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
          "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
          "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
          (1 to n).map(i =>
            s"<Override PartName=\"/xl/worksheets/sheet$i.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml\"/>")
            .mkString +
          "</Types>")
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
          "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
          "</Relationships>")
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          "\n<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
          "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"><sheets>" +
          names.zipWithIndex.map { case (nm, i) =>
            s"""<sheet name="${esc(nm)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString +
          "</sheets></workbook>")
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          "\n<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
          (1 to n).map(i =>
            s"<Relationship Id=\"rId$i\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet$i.xml\"/>")
            .mkString +
          "</Relationships>")
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        val header = df.columns.toSeq
        // Guard BEFORE materializing: limit() pushes into the scan, so
        // the driver never holds more than maxRows+1 rows even when the
        // caller hands us a fact table — the loud-failure contract is
        // enforced by the plan, not by an after-the-OOM require.
        val rows = df.limit(maxRows + 1).collect()
        require(rows.length <= maxRows,
          s"writeXlsx: sheet ${names(i)} has more than $maxRows rows — a " +
            "workbook is a bounded human artifact; " +
            "export big frames to parquet instead")
        part(s"xl/worksheets/sheet${i + 1}.xml",
          sheetXml(header, rows.toIndexedSeq.map(_.toSeq)))
      }
    } finally zos.close()
  }

  /** The reference's exact deliverable: [[Qa.runPipeline]]'s family
    * frames written as one workbook, one sheet per stat family, plus
    * the unioned wide sheet (the qa_workbook_pivot gate's frame) as
    * the first tab.
    */
  def writeQaWorkbook(pipeline: Map[String, DataFrame], timeVar: String,
                      path: String): Unit = {
    val all = "workbook" -> Qa.workbookSheets(pipeline, timeVar)
    val families = pipeline.toSeq.sortBy(_._1)
    writeXlsx(all +: families, path)
  }
}
