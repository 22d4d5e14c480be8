package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One WARC record parsed at the byte level: headers decoded (ASCII per
  * spec), body kept as the EXACT Content-Length byte slice — no charset
  * decode, no delimiter sensitivity. `lang` is the raw
  * WARC-Identified-Content-Language header (possibly comma-separated). */
final case class WarcByteRecord(
    file: String,
    recordType: String,
    url: String,
    warcDate: String,
    lang: String,
    contentLength: Long,
    body: Array[Byte])

/** Common-Crawl-style WARC/WET ingestion — the first mile that turns raw
  * crawl archives into the engine's pages table
  * `(url, warc_ts, html, text, lang)` (BASELINE.json input_hint).
  *
  * Mechanism: the text datasource with `lineSep = "WARC/1."` (version-
  * tolerant: 1.0 and 1.1 archives both split; the leftover version digit
  * is its own line and never matches an anchored header) splits each
  * archive into one row per record, DISTRIBUTIVELY — the source is
  * splittable for plain files (records spanning split boundaries are
  * handled by the line reader), and gzip members (how Common Crawl ships,
  * ~1 GB per `.warc.gz`) decompress one-per-task, which is exactly the
  * file-level parallelism real CC jobs use (~64k files per crawl). Header
  * fields and the Content-Length-framed body are then extracted with
  * native string expressions — the whole parse stays inside codegen; no
  * UDF, no mapPartitions.
  *
  * Framing correctness: Content-Length counts BYTES; the body is sliced by
  * casting to binary and byte-substring-ing, then cast back — a character
  * substring would over-read every non-ASCII body (CJK text, this engine's
  * own target) and drag record-separator junk into `text`. Header offsets
  * may be taken in characters because the WARC header block is ASCII (URIs
  * are percent-encoded); a record violating that shifts its own body only.
  *
  * Documented limits of the text-scan path (honest, not hidden):
  *  - a payload containing the literal token `WARC/1.` splits mid-record;
  *    BOTH fragments drop — the second has no header block, and the first
  *    fails the available-bytes-vs-Content-Length guard in [[bodySql]]
  *    (an under-length frame must never emit a silently truncated row);
  *  - the scan decodes UTF-8 — fine for WET (UTF-8 by spec), wrong for
  *    arbitrary-charset response payloads.
  * Both limits are lifted by the byte-level reader ([[recordsBytes]]):
  * Content-Length framing over raw bytes can neither split on body tokens
  * nor transcode, so [[readWarcHtml]] / [[readWetBytes]] are built on it.
  * The text scan remains the scale path for WET — it is splittable WITHIN
  * a file and fully codegen; the byte reader parallelizes per file (exactly
  * the granularity real `.warc.gz` archives force, one gzip stream each).
  */
object WarcIngest {

  /** Header lookup, anchored to line starts WITHIN the header block only —
    * an unanchored whole-record regex would resurrect fields from body text
    * that quotes WARC material (real in Common Crawl) or match
    * `X-WARC-Date:` as `WARC-Date:`. Case-insensitive: ISO 28500 field
    * names inherit RFC-5322 header semantics (`content-length:` is valid). */
  private def header(hdrCol: String, name: String): Column = {
    val v = regexp_extract(col(hdrCol), "(?mi)^" + name + ": ([^\r\n]+)", 1)
    when(length(v) > 0, v)
  }

  /** The pre-blank-line header block (CRLF per spec; bare-LF fallback for
    * hand-made fixtures), and the 1-based char offset where the body
    * starts. The header terminator is whichever blank line occurs FIRST —
    * preferring CRLF found anywhere would let an LF-framed record whose
    * body contains \r\n\r\n absorb its body into the header block,
    * re-opening the injection the anchored regexes close. The header block
    * is ASCII ⇒ char offsets == byte offsets up to the body start. */
  private val crlfPos = "locate('\r\n\r\n', value)"
  private val lfPos = "locate('\n\n', value)"
  private val crlfFirst = s"($crlfPos > 0 AND ($lfPos = 0 OR $crlfPos <= $lfPos))"
  private val hdrBlockSql =
    s"(CASE WHEN $crlfFirst THEN substring(value, 1, $crlfPos - 1) " +
      s"WHEN $lfPos > 0 THEN substring(value, 1, $lfPos - 1) " +
      "ELSE value END)"
  private val bodyStartSql =
    s"(CASE WHEN $crlfFirst THEN $crlfPos + 4 " +
      s"WHEN $lfPos > 0 THEN $lfPos + 2 END)"

  /** Content-Length-framed record body: `len` BYTES from the body start —
    * binary substring, then back to string (see object doc). A chunk
    * holding FEWER bytes than Content-Length is a fragment (a body that
    * contained the record delimiter, or a truncated archive tail): framing
    * it would emit a silently truncated row, so it yields null and
    * [[frame]] drops it. */
  private val bodySql = {
    // try_cast: regexp_extract's no-match '' (or an absurd length) must
    // yield null under ANSI mode, not throw
    val len = "try_cast(regexp_extract(__hdr, '(?mi)^Content-Length: ([0-9]+)', 1) AS INT)"
    s"CASE WHEN __start IS NOT NULL AND $len IS NOT NULL " +
      s"AND length(CAST(substring(value, __start) AS BINARY)) >= $len " +
      s"THEN CAST(substring(CAST(substring(value, __start) AS BINARY), 1, $len) AS STRING) END"
  }

  /** Record split + framing over an already-read raw text frame (one
    * `value` row per lineSep chunk) — shared by the batch and streaming
    * faces. Chunks without a frameable body (fragments, truncated tails,
    * missing Content-Length) drop here — corrupt input loses rows, never
    * corrupts them. */
  private def frame(raw: DataFrame): DataFrame =
    raw.filter(lower(col("value")).contains("warc-type: "))
      .withColumn("__hdr", expr(hdrBlockSql))
      .withColumn("__start", expr(bodyStartSql))
      .withColumn("__body", expr(bodySql))
      .filter(col("__body").isNotNull)

  /** One row per WARC record of the archives under `path`, with the header
    * block, body start, and framed body pre-split — the shared scan for
    * [[readWet]] / [[readWarcHtml]]. */
  def records(spark: SparkSession, path: String): DataFrame =
    frame(spark.read.option("lineSep", "WARC/1.").text(path))

  /** Streaming twin of [[records]]: new archive files landing under `path`
    * are split incrementally (file-source checkpointing gives exactly-once
    * per file — the monthly-crawl-drop catch-up pattern). */
  def recordsStream(spark: SparkSession, path: String): DataFrame =
    frame(spark.readStream.option("lineSep", "WARC/1.").text(path))

  /** The common ISO-639-3 tags Common Crawl emits, mapped to the engine's
    * 2-letter pages codes (`synth/Corpus` and `Extract.prepare`'s lang
    * filter use "zh"/"en"/…); unlisted tags pass through verbatim so no
    * information is dropped. */
  private val iso3to2: Map[String, String] = Map(
    "eng" -> "en", "deu" -> "de", "ger" -> "de", "fra" -> "fr", "fre" -> "fr",
    "spa" -> "es", "zho" -> "zh", "chi" -> "zh", "cmn" -> "zh", "por" -> "pt",
    "ita" -> "it", "nld" -> "nl", "rus" -> "ru", "jpn" -> "ja", "kor" -> "ko",
    "ara" -> "ar", "hin" -> "hi", "pol" -> "pl", "tur" -> "tr", "vie" -> "vi")

  private def normLang(tag: Column): Column = {
    val m = typedlit(iso3to2)
    coalesce(element_at(m, tag), tag)
  }

  private def wetProjection(recs: DataFrame): DataFrame =
    // type selection anchored to the header block — contains() over the
    // whole record would admit a response whose BODY quotes a type line;
    // try_to_timestamp: one corrupt crawl date must drop a field, not kill
    // the job under ANSI mode
    recs.filter(header("__hdr", "WARC-Type") === "conversion")
      .select(
        header("__hdr", "WARC-Target-URI").as("url"),
        try_to_timestamp(header("__hdr", "WARC-Date")).as("warc_ts"),
        lit(null).cast("binary").as("html"),
        col("__body").as("text"),
        normLang(split(header("__hdr", "WARC-Identified-Content-Language"), ",")
          .getItem(0)).as("lang"))
      .filter(col("url").isNotNull)

  /** WET text-conversion records → pages rows with `text` populated and
    * `html` null. `lang` = first WARC-Identified-Content-Language tag,
    * normalized to the engine's 2-letter codes (so ingest → extract
    * composes without an adapter); null when absent. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    wetProjection(records(spark, path))

  /** Streaming WET ingestion: the same projection over [[recordsStream]] —
    * each new `.wet`/`.warc.wet` drop is parsed once and flows into any
    * downstream streaming graph (e.g. `StreamExtract.triples`). */
  def readWetStream(spark: SparkSession, path: String): DataFrame =
    wetProjection(recordsStream(spark, path))

  // ------------------------------------------------------------------
  // Byte-level reader: Content-Length framing over raw bytes. The HTML
  // feed (arbitrary charsets, payloads that may quote WARC syntax) and
  // gzip'd archives come through here; the codegen text scan above stays
  // the splittable WET fast path.
  // ------------------------------------------------------------------

  /** Upper bound on one header block (spec headers are a few hundred
    * bytes); a "header" growing past this is garbage, and the file's parse
    * stops rather than buffering unboundedly. */
  private val MaxHeaderBytes = 1 << 20

  /** Sequential ISO-28500 record parse over a raw byte stream: version
    * line + header lines to the first blank line (CRLF per spec, bare LF
    * tolerated), then EXACTLY Content-Length body bytes, then the
    * inter-record CRLFs. Byte framing means a body containing `WARC/1.`,
    * a blank line, or any non-UTF-8 charset passes through untouched. A
    * record that cannot be framed (no `WARC/` magic where one is due,
    * missing Content-Length, truncated body) ends the file's parse — on
    * corrupt input rows are LOST, never silently corrupted. Lazy: one
    * record's body is resident at a time. */
  private[sources] def parseWarcStream(in: java.io.InputStream,
      file: String): Iterator[WarcByteRecord] = new Iterator[WarcByteRecord] {
    private val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(in, 64 * 1024), 1)
    private var nextRec: WarcByteRecord = fetch()

    /** Consume inter-record \r / \n bytes; false at EOF. */
    private def skipSeparators(): Boolean = {
      var b = pb.read()
      while (b == '\r' || b == '\n') b = pb.read()
      if (b < 0) false else { pb.unread(b); true }
    }

    /** Header block up to (excluding) the first blank line — `\n` followed
      * by an optional `\r` and another `\n`, which covers CRLFCRLF, LFLF,
      * and the mixed `\r\n\n` archives in the wild produce; null if EOF /
      * oversized / terminator never found. A rolling 3-byte tail drives the
      * detection (a per-byte buffer copy would make a terminator-less
      * garbage prefix O(MaxHeaderBytes²) — an effective task hang on
      * exactly the adversarial input this reader exists for). Header bytes
      * are ASCII per spec; ISO-8859-1 decode is byte-lossless if one isn't. */
    private def readHeaderBlock(): String = {
      val buf = new java.io.ByteArrayOutputStream(512)
      var p2 = -1; var p1 = -1 // the two bytes before the current one
      var b = pb.read()
      while (b >= 0 && buf.size < MaxHeaderBytes) {
        buf.write(b)
        val cut =
          if (b == '\n' && p1 == '\n') 2 // ...\n\n
          else if (b == '\n' && p1 == '\r' && p2 == '\n') 3 // ...\n\r\n
          else 0
        if (cut > 0) {
          val a = buf.toByteArray
          // CRLFCRLF lands on the \n\r\n case with the first \r kept — trim it
          var end = a.length - cut
          if (end > 0 && a(end - 1) == '\r') end -= 1
          return new String(a, 0, end, java.nio.charset.StandardCharsets.ISO_8859_1)
        }
        p2 = p1; p1 = b
        b = pb.read()
      }
      null
    }

    private def fetch(): WarcByteRecord = {
      if (!skipSeparators()) return null
      val hdr = readHeaderBlock()
      if (hdr == null) return null
      val lines = hdr.split("\r\n|\n")
      if (lines.isEmpty || !lines(0).startsWith("WARC/")) return null
      val fields = lines.iterator.drop(1)
        .flatMap { l =>
          val i = l.indexOf(':')
          if (i <= 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
        }
        .toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.head._2 } // first occurrence wins
      val len = fields.get("content-length").flatMap(v => v.toLongOption)
      len match {
        case Some(n) if n >= 0 && n <= Int.MaxValue =>
          val body = pb.readNBytes(n.toInt)
          if (body.length < n) null // truncated archive tail: drop, don't emit short
          else WarcByteRecord(file,
            fields.getOrElse("warc-type", null),
            fields.getOrElse("warc-target-uri", null),
            fields.getOrElse("warc-date", null),
            fields.getOrElse("warc-identified-content-language", null),
            n, body)
        case _ => null // Content-Length is mandatory (ISO 28500 §5.3)
      }
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcByteRecord = {
      val r = nextRec; nextRec = fetch(); r
    }
  }

  /** One row per WARC record, parsed at the byte level. Source is the
    * `binaryFile` datasource (one content array per file, file-granular
    * parallelism — the same granularity real `.warc.gz` archives force,
    * since each is one ~1 GB gzip stream; Common Crawl ships ~64k files
    * per crawl, ample parallelism for any cluster width). Gzip'd archives
    * (magic `1f 8b`) are decompressed in-stream, concatenated members
    * included — the compressed bytes are resident per task, decompressed
    * bytes only record-at-a-time. */
  def recordsBytes(spark: SparkSession, path: String): Dataset[WarcByteRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val raw = new java.io.ByteArrayInputStream(bytes)
        val in =
          if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
            new java.util.zip.GZIPInputStream(raw)
          else raw
        parseWarcStream(in, p)
      }
  }

  /** First blank line of an HTTP message (CRLF preferred only if it comes
    * first — same rule as the record framing): returns the byte offset
    * where the payload starts, or 0 if headerless (bare payload). */
  private def httpPayloadStart(b: Array[Byte]): Int = {
    var i = 0
    while (i < b.length - 1) {
      if (b(i) == '\n' && b(i + 1) == '\n') return i + 2
      if (i < b.length - 3 && b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i + 4
      i += 1
    }
    0
  }

  /** WARC response records → pages rows with `html` populated (the HTTP
    * payload after the response-header blank line, BYTE-exact for any
    * charset or compressed payload) and `text` null. */
  def readWarcHtml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    recordsBytes(spark, path)
      .filter(r => "response".equalsIgnoreCase(r.recordType) && r.url != null)
      .map { r =>
        val start = httpPayloadStart(r.body)
        (r.url, r.warcDate, java.util.Arrays.copyOfRange(r.body, start, r.body.length))
      }
      .toDF("url", "__date", "html")
      .select(col("url"), try_to_timestamp(col("__date")).as("warc_ts"),
        col("html"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"))
  }

  /** Byte-level WET twin of [[readWet]] — same output frame, built on
    * [[recordsBytes]]: immune to delimiter-token splits by construction,
    * so it doubles as the adversarial-input fallback for archives the
    * splittable text scan would drop fragments from. */
  def readWetBytes(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    recordsBytes(spark, path)
      .filter(r => "conversion".equalsIgnoreCase(r.recordType) && r.url != null)
      .map(r => (r.url, r.warcDate,
        new String(r.body, java.nio.charset.StandardCharsets.UTF_8), // WET is UTF-8 by spec
        Option(r.lang).map(_.split(",")(0).trim).orNull))
      .toDF("url", "__date", "text", "__lang")
      .select(col("url"), try_to_timestamp(col("__date")).as("warc_ts"),
        lit(null).cast("binary").as("html"), col("text"),
        normLang(col("__lang")).as("lang"))
  }

  // ------------------------------------------------------------------
  // Deterministic WET fixture writers (tests + the rows-only driver query):
  // spec-shaped records, CRLF framing, exact byte Content-Length.
  // ------------------------------------------------------------------

  /** Assemble one spec-shaped WARC record around a RAW byte body — exact
    * byte Content-Length, CRLF framing — for byte-level fixtures (tests and
    * the driver's `warc_bytes_ingest` query). `uri` null omits the header
    * (the malformed-record case). */
  def rawRecordBytes(tpe: String, uri: String, body: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val hdr = new StringBuilder("WARC/1.0\r\n")
    hdr.append(s"WARC-Type: $tpe\r\n")
    if (uri != null) hdr.append(s"WARC-Target-URI: $uri\r\n")
    hdr.append("WARC-Date: 2026-03-04T05:06:07Z\r\n")
    extraHeaders.foreach { case (k, v) => hdr.append(s"$k: $v\r\n") }
    hdr.append(s"Content-Length: ${body.length}\r\n\r\n")
    hdr.toString.getBytes("US-ASCII") ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** One gzip member over `bytes` — concatenate for `.warc.gz` fixtures
    * (one member per record, how Common Crawl ships). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  /** Write explicit records as one .wet file under `dir`:
    * `(url, isoLangTag, bodyText)` triples. Returns the file path. */
  def writeWetRecords(dir: String, fileName: String,
      recs: Seq[(String, String, String)]): String = {
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
    recs.zipWithIndex.foreach { case ((url, lang, body), i) =>
      record("conversion", Seq(
        "WARC-Target-URI" -> url,
        "WARC-Date" -> f"2026-01-02T${i % 24}%02d:00:00Z",
        "WARC-Identified-Content-Language" -> lang),
        body)
    }
    val p = java.nio.file.Paths.get(dir, fileName)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
    p.toString
  }

  /** Write `n` seeded WET conversion records (plus a warcinfo preamble) as
    * one .wet file under `dir`; returns the file path. Content is fully
    * determined by (n, seed) — both in the file name — so an existing file
    * is returned as-is: repeat invocations in one process reuse it, and a
    * rewrite can never race a lazy scan built from a prior invocation. */
  def writeWetFixture(dir: String, n: Int, seed: Long): String = {
    val p = java.nio.file.Paths.get(dir, s"fixture-$seed-$n.wet")
    if (java.nio.file.Files.exists(p)) return p.toString
    val rng = new scala.util.Random(seed)
    val langs = Seq("eng", "deu", "fra", "spa", "zho")
    val recs = (0 until n).map { i =>
      val words = Seq.fill(5 + rng.nextInt(40))(s"w${rng.nextInt(500)}")
      (f"https://synth.test/wet/$seed%d/$i%08d",
        langs(rng.nextInt(langs.length)), words.mkString(" "))
    }
    writeWetRecords(dir, p.getFileName.toString, recs)
  }
}
