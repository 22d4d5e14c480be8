package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Common-Crawl-style WARC/WET ingestion — the first mile that turns raw
  * crawl archives into the engine's pages table
  * `(url, warc_ts, html, text, lang)` (BASELINE.json input_hint).
  *
  * Mechanism: the text datasource with `lineSep = "WARC/1.0"` splits each
  * archive into one row per record, DISTRIBUTIVELY — the source is
  * splittable for plain files (records spanning split boundaries are
  * handled by the line reader), and gzip members (how Common Crawl ships,
  * ~1 GB per `.warc.gz`) decompress one-per-task, which is exactly the
  * file-level parallelism real CC jobs use (~64k files per crawl). Header
  * fields and the Content-Length-framed body are then extracted with
  * native string expressions — the whole parse stays inside codegen; no
  * UDF, no mapPartitions.
  *
  * Known caveat of delimiter splitting (documented, not hidden): a payload
  * containing the literal token `WARC/1.0` would split mid-record; the
  * subsequent header filter drops both fragments rather than emitting a
  * corrupt row (robust framing for adversarial payloads needs a custom
  * Content-Length-driven InputFormat).
  */
object WarcIngest {

  private def header(rec: Column, name: String): Column = {
    val v = regexp_extract(rec, name + ": ([^\r\n]+)", 1)
    when(length(v) > 0, v)
  }

  /** Content-Length-framed record body: the bytes after the first blank
    * line (CRLF per the WARC spec; a bare-LF fallback keeps hand-made
    * fixtures working). */
  private def bodyExpr(recCol: String): Column = {
    // substring with a column start/len needs the SQL form (the Scala
    // `substring` overload takes literals only)
    val crlf = s"locate('\r\n\r\n', $recCol)"
    val lf = s"locate('\n\n', $recCol)"
    val start = s"(CASE WHEN $crlf > 0 THEN $crlf + 4 WHEN $lf > 0 THEN $lf + 2 END)"
    // try_cast: regexp_extract's no-match '' (or an absurd length) must
    // yield null under ANSI mode, not throw
    val len = s"try_cast(regexp_extract($recCol, 'Content-Length: ([0-9]+)', 1) AS INT)"
    expr(s"CASE WHEN $start IS NOT NULL AND $len IS NOT NULL " +
      s"THEN substring($recCol, $start, $len) END")
  }

  /** One row per WARC record of the archives under `path` (raw text form,
    * pre-filter) — the shared scan for [[readWet]] / [[readWarcHtml]]. */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "WARC/1.0").text(path)
      .filter(col("value").contains("WARC-Type: "))

  /** WET text-conversion records → pages rows with `text` populated and
    * `html` null. `lang` comes from WARC-Identified-Content-Language when
    * present (first tag), else null. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    records(spark, path)
      .filter(col("value").contains("WARC-Type: conversion"))
      .select(
        header(col("value"), "WARC-Target-URI").as("url"),
        to_timestamp(header(col("value"), "WARC-Date")).as("warc_ts"),
        lit(null).cast("binary").as("html"),
        bodyExpr("value").as("text"),
        split(header(col("value"), "WARC-Identified-Content-Language"), ",")
          .getItem(0).as("lang"))
      .filter(col("url").isNotNull)

  /** WARC response records → pages rows with `html` populated (the HTTP
    * payload after the response-header blank line) and `text` null. */
  def readWarcHtml(spark: SparkSession, path: String): DataFrame = {
    val rec = records(spark, path)
      .filter(col("value").contains("WARC-Type: response"))
      .withColumn("__body", bodyExpr("value"))
    // the record body is an HTTP response: strip ITS header block the same
    // way (payload after the body's first blank line; whole body if none —
    // some archives store bare payloads)
    val crlf = "locate('\r\n\r\n', __body)"
    val lf = "locate('\n\n', __body)"
    rec.select(
        header(col("value"), "WARC-Target-URI").as("url"),
        to_timestamp(header(col("value"), "WARC-Date")).as("warc_ts"),
        expr(s"CASE WHEN $crlf > 0 THEN substring(__body, $crlf + 4) " +
          s"WHEN $lf > 0 THEN substring(__body, $lf + 2) ELSE __body END")
          .cast("binary").as("html"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"))
      .filter(col("url").isNotNull)
  }

  // ------------------------------------------------------------------
  // Deterministic WET fixture writer (tests + the rows-only driver query):
  // spec-shaped records, CRLF framing, exact Content-Length.
  // ------------------------------------------------------------------

  /** Write `n` seeded WET conversion records (plus a warcinfo preamble) as
    * one .wet file under `dir`; returns the file path. Bodies reuse the
    * deterministic synth corpus text so parses are reproducible. */
  def writeWetFixture(dir: String, n: Int, seed: Long): String = {
    val sb = new StringBuilder
    def record(tpe: String, headers: Seq[(String, String)], bodyText: String): Unit = {
      val bytes = bodyText.getBytes("UTF-8")
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: $tpe\r\n")
      headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"Content-Length: ${bytes.length}\r\n")
      sb.append("\r\n")
      sb.append(bodyText)
      sb.append("\r\n\r\n")
    }
    record("warcinfo", Seq("WARC-Date" -> "2026-01-01T00:00:00Z"),
      "software: graft-fixture")
    val rng = new scala.util.Random(seed)
    val langs = Seq("eng", "deu", "fra", "spa", "zho")
    var i = 0
    while (i < n) {
      val words = Seq.fill(5 + rng.nextInt(40))(s"w${rng.nextInt(500)}")
      record("conversion", Seq(
        "WARC-Target-URI" -> f"https://synth.test/wet/$seed%d/$i%08d",
        "WARC-Date" -> f"2026-01-02T${i % 24}%02d:00:00Z",
        "WARC-Identified-Content-Language" -> langs(rng.nextInt(langs.length))),
        words.mkString(" "))
      i += 1
    }
    val p = java.nio.file.Paths.get(dir, s"fixture-$seed.wet")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
    p.toString
  }
}
