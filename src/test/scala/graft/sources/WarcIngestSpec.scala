package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC/WET ingestion — golden parse, byte-exact Content-Length framing,
  * header-block anchoring, malformed tolerance, lang normalization, and a
  * real composition check against direct extraction. */
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
    // ISO-639-3 tags from the crawl normalize to the engine's 2-letter codes
    assert(rows.map(_.getString(4)).toSet === Set("en", "de", "fr", "es", "zh"))
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

  test("Content-Length frames BYTES: non-ASCII bodies carry no separator junk") {
    val dir = Files.createTempDirectory("graft-wet-b").toString
    val cjk = "胸部CT检查所见：两肺未见异常密度影。"
    val umlaut = "schön ist das Wetter draußen heute"
    WarcIngest.writeWetRecords(dir, "cjk.wet", Seq(
      ("https://x/cjk", "zho", cjk), ("https://x/de", "deu", umlaut)))
    val got = WarcIngest.readWet(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    // a char-counted substring would append "\r\n\r\n" (and worse) here
    assert(got("https://x/cjk") === cjk)
    assert(got("https://x/de") === umlaut)
  }

  test("header lookup anchors to the header block: body-quoted WARC headers cannot inject") {
    val dir = Files.createTempDirectory("graft-wet-i").toString
    // record with NO URI whose body quotes one: must DROP, not resurrect
    val evilBody = "quoted material:\nWARC-Target-URI: http://spam.example/\nend"
    val evilBytes = evilBody.getBytes("UTF-8")
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Date: 2026-03-04T05:06:07Z\r\n" +
      s"Content-Length: ${evilBytes.length}\r\n" +
      "\r\n" + evilBody + "\r\n\r\n" +
      // and an X-prefixed header must not match as WARC-Date
      "WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/ok\r\n" +
      "X-WARC-Date: 1999-01-01T00:00:00Z\r\n" +
      "Content-Length: 2\r\n" +
      "\r\nok\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "i.wet"), rec.getBytes("UTF-8"))
    val rows = WarcIngest.readWet(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "https://x/ok")
    assert(rows(0).isNullAt(1), "X-WARC-Date must not parse as WARC-Date")
  }

  test("a corrupt WARC-Date drops the field, not the job (ANSI try_to_timestamp)") {
    val dir = Files.createTempDirectory("graft-wet-d").toString
    val rec = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/baddate\r\n" +
      "WARC-Date: 2026-13-99T99:99:99Z\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "d.wet"), rec.getBytes("UTF-8"))
    val r = WarcIngest.readWet(spark, dir).collect()
    assert(r.length === 1 && r(0).isNullAt(1) && r(0).getString(3) === "ok")
  }

  test("type selection anchors to the header: a response body quoting a type line cannot cross feeds") {
    val dir = Files.createTempDirectory("graft-wet-t").toString
    val html = "<p>the line WARC-Type: conversion marks WET records</p>"
    val http = "HTTP/1.1 200 OK\r\n\r\n" + html
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://x/doc-about-warc\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" + http + "\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "t.warc"), rec.getBytes("UTF-8"))
    assert(WarcIngest.readWet(spark, dir).count() === 0,
      "a response record must never surface as a WET text row")
    assert(WarcIngest.readWarcHtml(spark, dir).count() === 1)
  }

  test("LF-framed records whose body contains a CRLF blank line frame at the FIRST blank line") {
    val dir = Files.createTempDirectory("graft-wet-lf").toString
    val body = "top\r\n\r\nWARC-Target-URI: http://spam.example/\nrest"
    val rec = "WARC/1.0\nWARC-Type: conversion\n" +
      "WARC-Target-URI: https://x/lf\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\n\n" + body + "\n\n"
    Files.write(java.nio.file.Paths.get(dir, "lf.wet"), rec.getBytes("UTF-8"))
    val r = WarcIngest.readWet(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "https://x/lf",
      "the body's CRLF blank line must not extend the header block")
    assert(r(0).getString(3) === body)
  }

  test("WARC/1.1 archives and case-varied header names parse (spec-mandated tolerance)") {
    val dir = Files.createTempDirectory("graft-wet-v").toString
    val b1 = "version one one"
    val b2 = "lower case headers"
    val rec = "WARC/1.1\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/v11\r\n" +
      s"Content-Length: ${b1.getBytes("UTF-8").length}\r\n\r\n$b1\r\n\r\n" +
      "WARC/1.1\r\nwarc-type: conversion\r\n" +
      "warc-target-uri: https://x/lc\r\n" +
      "warc-date: 2026-02-02T00:00:00Z\r\n" +
      s"content-length: ${b2.getBytes("UTF-8").length}\r\n\r\n$b2\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "v11.warc.wet"), rec.getBytes("UTF-8"))
    val got = WarcIngest.readWet(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got === Map("https://x/v11" -> b1, "https://x/lc" -> b2))
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

  // ---- byte-level reader -------------------------------------------------

  private def rawRecord(tpe: String, uri: String, body: Array[Byte],
      extra: Seq[(String, String)] = Nil): Array[Byte] =
    WarcIngest.rawRecordBytes(tpe, uri, body, extra)

  test("byte reader: an ISO-8859-1 payload survives byte-exactly (no replacement chars)") {
    val dir = Files.createTempDirectory("graft-warc-iso").toString
    val payload = "café über straße".getBytes("ISO-8859-1")
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n"
      .getBytes("US-ASCII") ++ payload
    Files.write(java.nio.file.Paths.get(dir, "iso.warc"),
      rawRecord("response", "https://x/iso", http))
    val r = WarcIngest.readWarcHtml(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Array[Byte]]("html").toSeq === payload.toSeq,
      "a UTF-8 text scan would have mangled every accented byte")
    assert(r(0).getTimestamp(1) != null)
  }

  test("byte reader: gzip'd archives (concatenated members) parse byte-exactly") {
    val dir = Files.createTempDirectory("graft-warc-gz").toString
    def gz(b: Array[Byte]): Array[Byte] = WarcIngest.gzipMember(b)
    val p1 = "<html>ÿþ binary-ish</html>".getBytes("ISO-8859-1")
    val p2 = "<p>two</p>".getBytes("UTF-8")
    // one member per record — exactly how Common Crawl ships .warc.gz
    val members = gz(rawRecord("response", "https://x/gz1",
      "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII") ++ p1)) ++
      gz(rawRecord("response", "https://x/gz2",
        "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII") ++ p2))
    Files.write(java.nio.file.Paths.get(dir, "two.warc.gz"), members)
    val got = WarcIngest.readWarcHtml(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("html").toSeq).toMap
    assert(got === Map("https://x/gz1" -> p1.toSeq, "https://x/gz2" -> p2.toSeq))
  }

  test("a body containing the record delimiter: byte reader exact, text scan drops (never truncates)") {
    val dir = Files.createTempDirectory("graft-warc-delim").toString
    val evil = "this page documents the WARC/1.0 format\r\n\r\nin detail"
    val fine = "an ordinary record after the delimiter-quoting one"
    val bytes = rawRecord("conversion", "https://x/evil",
      evil.getBytes("UTF-8"), Seq("WARC-Identified-Content-Language" -> "eng")) ++
      rawRecord("conversion", "https://x/fine",
        fine.getBytes("UTF-8"), Seq("WARC-Identified-Content-Language" -> "eng"))
    Files.write(java.nio.file.Paths.get(dir, "delim.wet"), bytes)
    // byte path: both records, the delimiter-quoting body byte-exact
    val byBytes = WarcIngest.readWetBytes(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(byBytes === Map("https://x/evil" -> evil, "https://x/fine" -> fine))
    assert(byBytes.values.forall(_ != null))
    // text path: the fragment DROPS (ADVICE guard) — a truncated
    // "…documents the " row must never surface; the following record is
    // unaffected
    val byText = WarcIngest.readWet(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(byText === Map("https://x/fine" -> fine),
      s"text scan must drop the unframeable fragment, got $byText")
  }

  test("byte reader: CRLF headers terminated by a bare-LF blank line still frame") {
    val dir = Files.createTempDirectory("graft-warc-mixed").toString
    // mixed-delimiter archive: every header line CRLF, blank line a bare \n
    val body = "mixed delimiter record body"
    val rec = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/mixed\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\n" + body + "\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://x/after\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    Files.write(java.nio.file.Paths.get(dir, "mixed.wet"), rec)
    val got = WarcIngest.readWetBytes(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got === Map("https://x/mixed" -> body, "https://x/after" -> "ok"),
      "a \\r\\n\\n terminator must neither absorb the body nor drop later records")
  }

  test("byte-level WET twin agrees with the text scan on a clean fixture") {
    val dir = Files.createTempDirectory("graft-wet-twin").toString
    WarcIngest.writeWetFixture(dir, n = 30, seed = 13)
    val text = WarcIngest.readWet(spark, dir)
      .selectExpr("url", "text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val bytes = WarcIngest.readWetBytes(spark, dir)
      .selectExpr("url", "text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(text.size === 30 && bytes === text,
      "two independent parsers over the same archive must agree field-exactly")
  }

  test("ingest → extract equals direct extraction on real zh documents") {
    import graft.synth.Corpus
    val dir = Files.createTempDirectory("graft-wet-x").toString
    val d1 = Corpus.buildDoc(1, seed = 77, noisyFrac = 0.0)
    val d2 = Corpus.buildDoc(2, seed = 77, noisyFrac = 0.0)
    // crawl-realistic 3-letter tags; the reader normalizes to "zh"
    WarcIngest.writeWetRecords(dir, "zh.wet", Seq(
      (d1.page.url, "zho", d1.page.text), (d2.page.url, "cmn", d2.page.text)))
    val viaWet = graft.pipeline.Extract.triples(WarcIngest.readWet(spark, dir))
      .collect().toSet
    import spark.implicits._
    val direct = graft.pipeline.Extract.triples(
      Seq((d1.page.url, d1.page.text, "zh"), (d2.page.url, d2.page.text, "zh"))
        .toDF("url", "text", "lang"))
      .collect().toSet
    assert(viaWet.nonEmpty, "fixture docs must carry extractable triples")
    assert(viaWet === direct,
      "WET ingestion must be a transparent first mile: identical triples")
    val langs = WarcIngest.readWet(spark, dir).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs === Set("zh"), "3-letter crawl tags must normalize to the engine code")
  }

  test("streaming WET ingestion catches up incrementally and matches the batch parse") {
    val root = Files.createTempDirectory("graft-wet-s").toString
    val in = root + "/drop"
    val ckpt = root + "/ckpt"
    val out = root + "/out"
    WarcIngest.writeWetFixture(in, n = 15, seed = 5)
    def runOnce(): Unit = {
      // file sink, not memory: the memory sink cannot recover a checkpoint,
      // and checkpointed catch-up IS the behavior under test
      val q = WarcIngest.readWetStream(spark, in)
        .select("url", "lang")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 15)
    // a second drop: only the NEW file is processed on restart
    WarcIngest.writeWetFixture(in, n = 10, seed = 6)
    runOnce()
    val all = spark.read.parquet(out).select("url").collect().map(_.getString(0)).toSeq
    assert(all.length === 25, "checkpoint must skip the already-ingested file")
    assert(all.distinct.length === 25)
    val batch = WarcIngest.readWet(spark, in).select("url").collect()
      .map(_.getString(0)).toSeq
    assert(all.sorted === batch.sorted, "stream and batch parses must agree")
  }

  test("fuzz: 100 random unicode bodies round-trip byte-exactly") {
    val dir = Files.createTempDirectory("graft-wet-f").toString
    val rnd = new scala.util.Random(20260817L)
    val alphabet: IndexedSeq[String] = IndexedSeq(
      "a", "Z", "9", " ", "\t", "\n", "\r\n", "é", "ß", "中", "文", "。",
      "，", "🙂", " ", "́" /* combining accent */, "…", "\"", "'")
    val recs = (0 until 100).map { i =>
      // any body is legal except one containing the record delimiter
      // (documented split limit); empty bodies included
      val body = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      (s"https://fuzz.test/$i", "eng", body)
    }
    WarcIngest.writeWetRecords(dir, "fuzz.wet", recs)
    val got = WarcIngest.readWet(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    recs.foreach { case (url, _, body) =>
      assert(got(url) === body,
        s"byte framing must survive arbitrary unicode; url=$url body=${body.take(40)}…")
    }
  }

  test("streaming first mile end-to-end: WET drop → streaming extraction → triples") {
    import graft.synth.Corpus
    val root = Files.createTempDirectory("graft-wet-e2e").toString
    val in = root + "/drop"
    val d1 = Corpus.buildDoc(5, seed = 31, noisyFrac = 0.0)
    val d2 = Corpus.buildDoc(6, seed = 31, noisyFrac = 0.0)
    WarcIngest.writeWetRecords(in, "drop1.wet", Seq(
      (d1.page.url, "zho", d1.page.text), (d2.page.url, "cmn", d2.page.text)))
    // the SAME extractor graph the batch pipeline uses, fed by the streaming
    // WET source — no adapter anywhere between archive bytes and triples
    val q = graft.streaming.StreamExtract.triples(WarcIngest.readWetStream(spark, in))
      .toDF()
      .writeStream.format("parquet")
      .option("path", root + "/triples")
      .option("checkpointLocation", root + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.read.parquet(root + "/triples").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    import spark.implicits._
    val direct = graft.pipeline.Extract.triples(
      Seq((d1.page.url, d1.page.text, "zh"), (d2.page.url, d2.page.text, "zh"))
        .toDF("url", "text", "lang")).toDF().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(streamed.nonEmpty && streamed === direct,
      "archive → streaming extraction must emit exactly the batch triples")
  }

  test("a single large archive splits across tasks without losing boundary records") {
    val dir = Files.createTempDirectory("graft-wet-big").toString
    WarcIngest.writeWetFixture(dir, n = 2000, seed = 8)
    val saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val got = WarcIngest.readWet(spark, dir)
      val parts = got.rdd.getNumPartitions
      assert(parts > 4, s"a ~${new java.io.File(dir).listFiles()(0).length / 1024}KB file " +
        s"at 64KB splits should read in many tasks, got $parts")
      val urls = got.select("url").collect().map(_.getString(0)).toSeq
      assert(urls.length === 2000, "records straddling split boundaries must not drop")
      assert(urls.distinct.length === 2000, "…or duplicate")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
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
