package graft

import java.nio.file.Files
import java.util.zip.ZipFile

import graft.eval.Metrics
import graft.io.Xlsx

/** S6 xlsx sink: the written file must be a structurally valid OOXML
  * package whose one sheet round-trips the metrics table — verified by
  * unzipping and XML-parsing with the JDK's own parser (no spreadsheet
  * library in the sandbox, which is exactly why the writer exists). */
class XlsxSpec extends SparkSpec {

  private def sheetRows(path: String): Seq[Seq[String]] = {
    val zf = new ZipFile(path)
    try {
      // all four boilerplate parts + the sheet must be present
      for (p <- Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
          "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
        assert(zf.getEntry(p) != null, s"missing OOXML part $p")
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
      val rows = doc.getElementsByTagName("row")
      (0 until rows.getLength).map { i =>
        val cells = rows.item(i).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagName("t")
        (0 until cells.getLength).map(j => cells.item(j).getTextContent)
      }
    } finally zf.close()
  }

  test("Xlsx.write produces a parseable sheet and escapes XML metacharacters") {
    val path = Files.createTempDirectory("graft-xlsx").resolve("t.xlsx").toString
    Xlsx.write(path, Seq("a", "b"), Seq(Seq("x<&\">y", "1.5"), Seq("plain", "2")))
    assert(sheetRows(path) === Seq(Seq("a", "b"), Seq("x<&\">y", "1.5"), Seq("plain", "2")))
    intercept[IllegalArgumentException] {
      Xlsx.write(path, Seq("a", "b"), Seq(Seq("only-one-cell")))
    }
  }

  test("XML-invalid control chars are stripped (sheet stays parseable); bad sheet names are refused") {
    val path = Files.createTempDirectory("graft-xlsx").resolve("c.xlsx").toString
    // NUL/backspace/lone-surrogate junk in a cell must not poison the part;
    // tab and newline are XML-legal and survive
    Xlsx.write(path, Seq("h"), Seq(
      Seq("a\u0000b\u0008c"), Seq("tab\there"), Seq("lone\ud800surrogate")))
    assert(sheetRows(path) === Seq(Seq("h"),
      Seq("abc"), Seq("tab\there"), Seq("lonesurrogate")))
    intercept[IllegalArgumentException] {
      Xlsx.write(path, Seq("h"), Seq(Seq("x")), sheetName = "way/too:bad")
    }
    intercept[IllegalArgumentException] {
      Xlsx.write(path, Seq("h"), Seq(Seq("x")), sheetName = "x" * 32)
    }
  }

  test("writePerformanceXlsx emits the reference's columns (typo included) from the metrics table") {
    import spark.implicits._
    val perType = Seq(
      ("Size", 8L, 9L, 10L, 10L, 7L, 0.8, 0.8, 0.9, 0.9, 0.8, 0.9),
      ("Mass", 5L, 5L, 5L, 10L, 5L, 1.0, 0.5, 1.0, 0.5, 2.0 / 3, 2.0 / 3))
      .toDF("question_type", "tp_precise", "tp_blurred", "num_pre", "num_gold",
        "match_count", "precision_precise", "recall_precise", "precision_blurred",
        "recall_blurred", "f1_precise", "f1_blurred")
    val path = Files.createTempDirectory("graft-xlsx2").resolve("test_res.xlsx").toString
    Metrics.writePerformanceXlsx(perType, path)
    val rows = sheetRows(path)
    assert(rows.head === Seq("queation_type", "precision_blurred", "recall_blurred",
      "f1_blurred", "precision_precise", "recall_precise", "f1_precise"),
      "header must be the reference's verbatim (typo and all)")
    // deterministic question_type order; values stringified doubles
    assert(rows(1).head === "Mass" && rows(2).head === "Size")
    assert(rows(1)(4) === "1.0" && rows(2)(4) === "0.8")
    assert(rows(1)(1) === "1.0" && rows(2)(1) === "0.9")
  }
}
