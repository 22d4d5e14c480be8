package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC/WET ingestion — golden parse, Content-Length framing, malformed
  * tolerance, and partitioning invariance. */
class WarcIngestSpec extends SparkSpec {

  test("WET fixture round-trips: every record parsed, fields exact") {
    val dir = Files.createTempDirectory("graft-wet").toString
    WarcIngest.writeWetFixture(dir, n = 40, seed = 9)
    val got = WarcIngest.readWet(spark, dir)
    assert(got.columns.toSeq === Seq("url", "warc_ts", "html", "text", "lang"))
    val rows = got.orderBy("url").collect()
    assert(rows.length === 40) // warcinfo preamble excluded
    assert(rows.forall(r => r.getString(0).startsWith("https://synth.test/wet/9/")))
    assert(rows.forall(r => !r.isNullAt(1)), "warc_ts must parse")
    assert(rows.forall(_.isNullAt(2)), "WET rows carry no html")
    assert(rows.forall(r => r.getString(3).startsWith("w") && !r.getString(3).endsWith("\n")),
      "body must be Content-Length framed (no trailing record separator)")
    assert(rows.forall(r => Seq("eng", "deu", "fra", "spa", "zho").contains(r.getString(4))))
  }

  test("a hand-written golden record parses byte-exactly") {
    val dir = Files.createTempDirectory("graft-wet-g").toString
    val bodyText = "first line\nsecond line with trailing spaces   "
    val bytes = bodyText.getBytes("UTF-8")
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://example.org/page?a=1\r\n" +
      "WARC-Date: 2026-03-04T05:06:07Z\r\n" +
      s"Content-Length: ${bytes.length}\r\n" +
      "\r\n" + bodyText + "\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "one.wet"), rec.getBytes("UTF-8"))
    val r = WarcIngest.readWet(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "https://example.org/page?a=1")
    assert(r(0).getTimestamp(1).toInstant.toString === "2026-03-04T05:06:07Z")
    assert(r(0).getString(3) === bodyText, "Content-Length must frame the body exactly")
    assert(r(0).isNullAt(4), "no language header -> null lang")
  }

  test("malformed records (no URI, no blank line, no length) drop instead of corrupting") {
    val dir = Files.createTempDirectory("graft-wet-m").toString
    val junk = "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n" + // no URI
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://x/1\r\nContent-Length: 2\r\nno blank line" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://x/2\r\n\r\nbody but no length\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://x/3\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\nokrest\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "m.wet"), junk.getBytes("UTF-8"))
    val rows = WarcIngest.readWet(spark, dir).collect()
    // record 1 drops (null url); 2 and 3 survive with null text (unframeable)
    val byUrl = rows.map(r => r.getString(0) -> (if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(!byUrl.contains(null))
    assert(byUrl("https://x/3") === "ok", "Content-Length 2 must take exactly 2 chars")
    assert(byUrl.get("https://x/2").forall(_ == null), "no Content-Length -> null text")
  }

  test("WARC response records yield html binary with the HTTP header stripped") {
    val dir = Files.createTempDirectory("graft-warc").toString
    val payload = "<html><body>hi</body></html>"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
    val bytes = http.getBytes("UTF-8")
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.org/\r\n" +
      "WARC-Date: 2026-03-04T05:06:07Z\r\n" +
      s"Content-Length: ${bytes.length}\r\n" +
      "\r\n" + http + "\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "one.warc"), rec.getBytes("UTF-8"))
    val r = WarcIngest.readWarcHtml(spark, dir).collect()
    assert(r.length === 1)
    assert(new String(r(0).getAs[Array[Byte]]("html"), "UTF-8") === payload)
    assert(r(0).isNullAt(3) && r(0).isNullAt(4))
  }

  test("WET output feeds the extractor directly: the input_hint schema contract holds") {
    val dir = Files.createTempDirectory("graft-wet-x").toString
    WarcIngest.writeWetFixture(dir, n = 10, seed = 4)
    val pages = WarcIngest.readWet(spark, dir)
    // the whole point of the first mile: no adapter between ingestion and
    // extraction — analyze + execute must succeed on the parsed frame
    val triples = graft.pipeline.Extract.triples(pages)
    assert(triples.count() >= 0) // synthetic latin bodies: typically zero triples
  }

  test("multi-file reads parallelize and agree with the single-file parse") {
    val dir = Files.createTempDirectory("graft-wet-p").toString
    WarcIngest.writeWetFixture(dir, n = 25, seed = 1)
    WarcIngest.writeWetFixture(dir, n = 25, seed = 2)
    val urls = WarcIngest.readWet(spark, dir).select("url").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(urls.length === 50)
    assert(urls.count(_.contains("/wet/1/")) === 25)
    // the parse is a native projection over a splittable text scan: plan
    // must show no object barrier
    val plan = WarcIngest.readWet(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("SerializeFromObject"), plan)
  }
}
