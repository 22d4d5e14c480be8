package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Documented limits (honest, not hidden):
  *  - a payload containing the literal token `WARC/1.` splits mid-record;
  *    the header filter drops both fragments rather than emitting a corrupt
  *    row (adversarial framing needs a Content-Length-driven InputFormat);
  *  - the scan decodes UTF-8, so [[readWarcHtml]] is byte-exact only for
  *    ASCII/UTF-8 payloads — other charsets or compressed bodies arrive
  *    with replacement characters and need a byte-level reader.
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
    * binary substring, then back to string (see object doc). */
  private val bodySql = {
    // try_cast: regexp_extract's no-match '' (or an absurd length) must
    // yield null under ANSI mode, not throw
    val len = "try_cast(regexp_extract(__hdr, '(?mi)^Content-Length: ([0-9]+)', 1) AS INT)"
    s"CASE WHEN __start IS NOT NULL AND $len IS NOT NULL " +
      s"THEN CAST(substring(CAST(substring(value, __start) AS BINARY), 1, $len) AS STRING) END"
  }

  /** Record split + framing over an already-read raw text frame (one
    * `value` row per lineSep chunk) — shared by the batch and streaming
    * faces. */
  private def frame(raw: DataFrame): DataFrame =
    raw.filter(lower(col("value")).contains("warc-type: "))
      .withColumn("__hdr", expr(hdrBlockSql))
      .withColumn("__start", expr(bodyStartSql))
      .withColumn("__body", expr(bodySql))

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

  /** WARC response records → pages rows with `html` populated (the HTTP
    * payload after the response-header blank line) and `text` null. Exact
    * for ASCII/UTF-8 payloads only — see the object doc's limits. */
  def readWarcHtml(spark: SparkSession, path: String): DataFrame = {
    // the record body is an HTTP response: strip ITS header block the same
    // way (payload after the body's first blank line; whole body if none —
    // some archives store bare payloads)
    val crlf = "locate('\r\n\r\n', __body)"
    val lf = "locate('\n\n', __body)"
    records(spark, path)
      .filter(header("__hdr", "WARC-Type") === "response")
      .select(
        header("__hdr", "WARC-Target-URI").as("url"),
        try_to_timestamp(header("__hdr", "WARC-Date")).as("warc_ts"),
        expr(s"CASE WHEN $crlf > 0 THEN substring(__body, $crlf + 4) " +
          s"WHEN $lf > 0 THEN substring(__body, $lf + 2) ELSE __body END")
          .cast("binary").as("html"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"))
      .filter(col("url").isNotNull)
  }

  // ------------------------------------------------------------------
  // Deterministic WET fixture writers (tests + the rows-only driver query):
  // spec-shaped records, CRLF framing, exact byte Content-Length.
  // ------------------------------------------------------------------

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
