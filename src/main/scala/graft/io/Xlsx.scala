package graft.io

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal single-sheet .xlsx writer (S6 — the reference's metrics sink is a
  * real Excel file, `df.to_excel(...'{sign}_res.xlsx', index=None)`,
  * utils/evaluate_funcs.py:306): an xlsx is a zip of OOXML parts, so a
  * dependency-free writer is four boilerplate XML parts plus one sheet of
  * inline-string cells. Inline strings (no shared-string table) keep the
  * writer single-pass; every spreadsheet reader supports them.
  *
  * Driver-side by design: the reference's sheet is the per-question-type
  * metrics table — 17 rows, bounded by the ontology, the same bounded
  * collect the metrics map already does. Corpus-scale tables belong in
  * parquet ([[TableIO]]); this sink exists for the human-facing artifact
  * parity. */
object Xlsx {

  /** Entity-escape markup characters and STRIP XML-invalid code points
    * (C0 controls other than tab/LF/CR, and the lone-surrogate range) — a
    * single such byte in a cell value would make the whole sheet part
    * unparseable to every reader. Stripping (not erroring) matches what
    * spreadsheet writers conventionally do with binary junk in text cells. */
  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\t' || c == '\n' || c == '\r') sb.append(c)
      else if (c < 0x20 || c == 0xFFFE.toChar || c == 0xFFFF.toChar) () // strip
      else if (Character.isHighSurrogate(c)) {
        // keep only PAIRED surrogates (a lone one is invalid XML)
        if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) {
          sb.append(c).append(s.charAt(i + 1)); i += 1
        }
      } else if (!Character.isLowSurrogate(c)) sb.append(c)
      i += 1
    }
    sb.toString
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
  }

  /** Write `header` + `rows` as one worksheet at `path`. */
  def write(path: String, header: Seq[String], rows: Seq[Seq[String]],
      sheetName: String = "Sheet1"): Unit = {
    require(rows.forall(_.length == header.length),
      "every row must have one cell per header column")
    // Excel's sheet-name rules: 1-31 chars, none of []:*?/\ — a violating
    // name writes a file Excel refuses to open, so fail at the call site.
    // Validated AFTER esc()'s control-char stripping: a name of only
    // strippable code points would otherwise pass nonEmpty here and still
    // land as name="" in workbook.xml — the exact file this guard exists
    // to refuse. (esc also entity-escapes, which cannot empty a name.)
    require(esc(sheetName).nonEmpty && sheetName.length <= 31,
      s"sheet name must be 1-31 chars after XML-invalid stripping: '$sheetName'")
    require(!sheetName.exists("[]:*?/\\".contains(_)),
      s"sheet name must not contain []:*?/\\ : '$sheetName'")
    def row(cells: Seq[String]): String =
      cells.map(c => s"""<c t="inlineStr"><is><t>${esc(c)}</t></is></c>""")
        .mkString("<row>", "", "</row>")
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        "<sheetData>" + (header +: rows).map(row).mkString + "</sheetData></worksheet>"
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        "</Types>"
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>""" +
        "</workbook>"
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        "</Relationships>"
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def part(name: String, body: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(body.getBytes(UTF_8))
        zos.closeEntry()
      }
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", rootRels)
      part("xl/workbook.xml", workbook)
      part("xl/_rels/workbook.xml.rels", workbookRels)
      part("xl/worksheets/sheet1.xml", sheet)
    } finally zos.close()
  }
}
