package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline —
  * language-ID, quality scoring, token counting, fingerprinting. All native
  * Column expressions (codegen'd, no UDFs), so they survive 100× scale-up
  * inside whole-stage codegen.
  */
object TextStats {

  /** Whitespace token count (empty string → 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word-ish runs + digits + punctuation singles,
    * approximating a byte-level BPE pre-tokenizer's piece count. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), s => length(s) > 0))

  /** Non-ASCII character count / ratio — the n-gram-free core of a
    * heuristic language identifier. */
  def nonAsciiCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^\\x00-\\x7F]", ""))

  /** Heuristic language ID: CJK-dominant → "cjk", else latin. */
  def langGuess(text: Column): Column =
    when(length(text) === 0, lit("unknown"))
      .when(nonAsciiCount(text).cast("double") / length(text) > 0.3, lit("cjk"))
      .otherwise(lit("latin"))

  /** Punctuation ratio: sentence punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(regexp_replace(text, "[.!?,;:。，！？；：]", "")))
        .cast("double") / length(text))

  /** Common-English stopwords (top function words) for density scoring. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "was", "for", "on", "with", "as", "at", "by", "this", "are", "be",
    "from", "not", "but", "they", "his", "her", "its", "we", "you")

  /** Lowercased whitespace tokens — THE tokenizer shared by every term-level
    * op (stopwordRatio, tfidfTopK) and mirrored by their DuckDB oracles'
    * `string_split_regex(lower(trim(text)), '\s+')`. Known latent
    * divergence, shared by all text_* oracles: Java `\s` includes U+000B
    * (vertical tab), RE2's does not — the synthetic corpus contains neither,
    * and any tokenizer change must land here AND in each oracle's regex. */
  private[ops] def lowerTokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Stopword ratio: stopword tokens / all tokens (0 for empty) — the
    * classic fluency signal (boilerplate/token-soup text scores low, prose
    * scores 0.3-0.6). Native `filter` + `isInCollection` (InSet, codegen'd). */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(
        size(filter(lowerTokens(text), w => w.isInCollection(stopwords)))
          .cast("double") / tokenCount(text))

  /** Mean word length over whitespace tokens (0 for empty). */
  def meanWordLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text))

  /** Composite quality score in [0,1]: rewards mid-length docs, penalizes
    * punctuation soup and absurd word lengths. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 4.0, lit(1.0))
    val wordScore = when(meanWordLen(text).between(2.0, 12.0), 1.0).otherwise(0.4)
    round(greatest(lit(0.0), lenScore * wordScore * (lit(1.0) - punctPenalty * 0.5)), 4)
  }

  /** 64-bit document fingerprint over the normalized text (xxhash64 of the
    * whitespace-collapsed lowercase body) — exact-dup key at corpus scale. */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(text, "\\s+", " ")))

  // ------------------------------------------------------------------
  // TF-IDF characteristic terms — the corpus-weighted keyword extractor a
  // training-data pipeline uses for topic tagging, quality heuristics, and
  // near-dup triage. Smoothed sklearn-style idf: ln((N+1)/(df+1)) + 1.
  // ------------------------------------------------------------------

  /** Top-k characteristic terms per document by TF-IDF.
    *
    * Scale shape (long-id path — every internal caller; each stage bounded,
    * no skew traps):
    *  - per-doc term frequencies are computed MAP-SIDE from the token array
    *    (one O(tokens) pass per doc) — a document's tokens already live in
    *    its own row, so shuffling the (doc, term) table just to count it
    *    (the previous groupBy) moved the whole term table for nothing
    *  - `df` agg shuffles on term — output is vocabulary-sized, partial agg
    *    keeps the exchange at |vocab|, not |tokens|
    *  - the tf⋈df join BROADCASTS the vocabulary side (`broadcastVocab`,
    *    default on: Heaps-law vocabularies are far smaller than the corpus;
    *    a deployment with a pathological term space opts out), so the big
    *    (doc, term) side never exchanges on term and a stopword's
    *    corpus-sized row set cannot become a hot join key
    *  - ranking: a per-partition BOUNDED HEAP (k per doc, the
    *    [[Similarity.bruteForceTopK]] discipline) keeps only top-k
    *    candidates, so the final exact ranking window exchanges SURVIVORS
    *    only (≤ k · partitions-per-doc rows), never the full term table
    * `N` (corpus size = valid docs, token-less ones included) joins in
    * LAZILY as a 1-row aggregate cross join — no eager driver count, the
    * operator composes like any other transformation (the count pass is a
    * zero-column scan, metadata-cheap at any scale). Ranks are fully
    * deterministic: ties on the rounded score break by term. Null ids/texts
    * are dropped/empty. A non-long id column falls back to the generic
    * window formulation (same rows, id type preserved). */
  def tfidfTopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 5,
      broadcastVocab: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val valid = docs.filter(col(idCol).isNotNull)
    val corpusN = valid.agg(count(lit(1)).as("corpus_n"))
    val toksCol = filter(lowerTokens(coalesce(col(textCol), lit(""))),
      t => length(t) > 0)
    def tfidfCol = round(
      col("tf") * (log((col("corpus_n") + 1.0) / (col("df") + 1.0)) + 1.0), 4)
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))

    if (valid.schema(idCol).dataType != org.apache.spark.sql.types.LongType) {
      // generic-id fallback: the original declarative formulation
      val toks = valid.select(col(idCol), explode(toksCol).as("term"))
      val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      return tf.join(dfreq, "term").crossJoin(corpusN)
        .withColumn("tfidf", tfidfCol)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
    }

    val tf = valid.select(col(idCol).as("__id"), toksCol.as("__toks"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, ts) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        ts.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
        m.iterator.map { case (t, c) => (id, t, c) }
      }.toDF(idCol, "term", "tf")
    // df per term from the per-doc DISTINCT terms (array_distinct is the
    // map-side twin of "one tf row per (doc, term)"); sharing the tf branch
    // instead would re-run the flatMap once per consumer — this branch stays
    // whole-stage-codegen and reuses the upstream exchange when one exists
    val dfreqRaw = valid.select(explode(array_distinct(toksCol)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val dfreq = if (broadcastVocab) broadcast(dfreqRaw) else dfreqRaw
    val scored = tf.join(dfreq, "term").crossJoin(corpusN)
      .withColumn("tfidf", tfidfCol)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
    // per-partition bounded top-k (worst element at the heap head, ordering
    // mirroring the final (tfidf desc, term asc) rank): the global top-k of
    // every doc survives its partition's local top-k, so the window below
    // is exact over survivors only
    val partial = scored.as[(Long, String, Long, Long, Double)]
      .mapPartitions { it =>
        val worstFirst: Ordering[(Double, String, Long, Long)] =
          (a, b) => {
            val c = java.lang.Double.compare(b._1, a._1) // lower score = worse
            if (c != 0) c else a._2.compareTo(b._2) // higher term = worse
          }
        val heaps = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, String, Long, Long)]]
        it.foreach { case (id, term, tfv, dfv, s) =>
          val h = heaps.getOrElseUpdate(id,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < k) h.enqueue((s, term, tfv, dfv))
          else {
            val worst = h.head
            if (s > worst._1 || (s == worst._1 && term < worst._2)) {
              h.dequeue(); h.enqueue((s, term, tfv, dfv))
            }
          }
        }
        heaps.iterator.flatMap { case (id, h) =>
          h.iterator.map(e => (id, e._2, e._3, e._4, e._1))
        }
      }.toDF(idCol, "term", "tf", "df", "tfidf")
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  // ------------------------------------------------------------------
  // Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  // Local Algorithms for Document Fingerprinting", SIGMOD'03): Rabin-Karp
  // rolling hash over char k-grams, then the minimum hash of every
  // w-hash window is selected (rightmost minimum — the standard robust
  // choice). Density ≈ 2/(w+1) of positions, guaranteed to share a
  // fingerprint with any other document containing a common substring of
  // length ≥ k + w - 1 — the content-defined fingerprint that detects
  // PARTIAL overlap, which a whole-document hash cannot.
  // ------------------------------------------------------------------

  /** Distinct winnowed fingerprints of `text` (lowercased, whitespace
    * collapsed). O(n) — one rolling-hash pass + a monotonic deque. */
  def winnowFingerprints(text: String, k: Int = 16, w: Int = 8): Array[Long] = {
    require(k >= 2 && w >= 1)
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    val n = t.length - k + 1
    if (n <= 0) return Array.empty
    val B = 257L
    var bk = 1L // B^(k-1), wrapping mod 2^64
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    val hs = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + t.charAt(i); i += 1 }
    hs(0) = Hashing.splitmix64(h) // finalize: raw polynomial hashes cluster
    i = 1
    while (i < n) {
      h = (h - t.charAt(i - 1) * bk) * B + t.charAt(i + k - 1)
      hs(i) = Hashing.splitmix64(h)
      i += 1
    }
    // rightmost-minimum per window of w hashes, via monotonic index deque
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst <= i - w) dq.pollFirst()
      if (i >= w - 1) out += hs(dq.peekFirst)
      i += 1
    }
    out.toArray
  }

  // ------------------------------------------------------------------
  // N-gram language ID (Cavnar & Trenkle, "N-Gram-Based Text
  // Categorization", SDAIR'94 style): smoothed char-trigram profiles per
  // language, argmax log-likelihood. Profiles are built once per JVM from
  // small embedded seed texts (deterministic, no external data); scoring is
  // a per-row primitive loop — the broadcast-constant + mapPartitions shape
  // every executor-side model in this engine uses.
  // ------------------------------------------------------------------

  private val langSeeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it was " +
      "that this is not the only thing which could have been done for the " +
      "people who were there with them during the first of these things"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und " +
      "dann ist es nicht das einzige was für die menschen getan werden " +
      "konnte die dort mit ihnen während der ersten dieser dinge waren"),
    "fr" -> ("le renard brun rapide saute par dessus le chien paresseux et " +
      "ce nest pas la seule chose qui aurait pu être faite pour les gens " +
      "qui étaient là avec eux pendant la première de ces choses"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y no es " +
      "lo único que se podría haber hecho para las personas que estaban " +
      "allí con ellos durante la primera de estas cosas"))

  private def trigrams(s: String): Iterator[String] = {
    val t = " " + s.toLowerCase.replaceAll("\\s+", " ").trim + " "
    if (t.length < 3) Iterator.empty
    else (0 to t.length - 3).iterator.map(i => t.substring(i, i + 3))
  }

  /** (language, smoothed log-prob table, log-prob of an unseen trigram). */
  lazy val langProfiles: Seq[(String, Map[String, Double], Double)] =
    langSeeds.toSeq.sortBy(_._1).map { case (lang, seed) =>
      val counts = trigrams(seed).toSeq.groupBy(identity).view.mapValues(_.size).toMap
      val total = counts.values.sum.toDouble
      val vocab = counts.size + 1
      val table = counts.map { case (g, c) => g -> math.log((c + 1.0) / (total + vocab)) }
      (lang, table, math.log(1.0 / (total + vocab)))
    }

  private def isCjk(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF) ||
      (c >= 0x3000 && c <= 0x30FF) || (c >= 0xFF00 && c <= 0xFFEF)

  /** Plain-Scala n-gram language guess: "zh" for CJK-dominant text (trigram
    * profiles are an alphabetic-script instrument), "unknown" for text
    * dominated by scripts OUTSIDE the profile alphabet (Cyrillic, Greek,
    * Arabic, …) — a wrong-but-confident Latin label would be worse — else
    * argmax profile log-likelihood. Deterministic. */
  def langNgramGuess(text: String): String = {
    if (text == null || text.isEmpty) return "unknown"
    val cjk = text.count(isCjk)
    if (cjk.toDouble / text.length > 0.3) return "zh"
    val nonLatin = text.count(c => c > 0x7f && !isCjk(c) &&
      !java.lang.Character.UnicodeScript.of(c).equals(java.lang.Character.UnicodeScript.LATIN))
    // same dominance threshold as CJK: a 30%+ out-of-alphabet-script share
    // must yield "unknown", never a confident Latin-profile label
    if (nonLatin.toDouble / text.length > 0.3) return "unknown"
    val gs = trigrams(text).toArray
    if (gs.isEmpty) return "unknown"
    langProfiles.maxBy { case (_, table, unseen) =>
      var s = 0.0
      var i = 0
      while (i < gs.length) { s += table.getOrElse(gs(i), unseen); i += 1 }
      s
    }._1
  }

  /** DataFrame face of [[langNgramGuess]]: adds `lang_guess` next to the
    * projected columns. Backed by the native codegen expression
    * ([[graft.functions.LangNgramGuess]]) — the earlier `mapPartitions`
    * form split the stage and deserialized every in-flight column; this
    * stays inside whole-stage codegen. Null text scores "unknown", as the
    * plain-Scala scorer does. */
  def withLangNgram(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    graft.functions.LangNgramGuess.register(df.sparkSession)
    // backtick-quote WITH doubling: a caller's column name must never parse
    // as SQL (col(textCol) accepted any name; `a-b` unquoted would
    // subtract, and an embedded backtick would escape the quoting)
    val quoted = "`" + textCol.replace("`", "``") + "`"
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as(idCol),
        coalesce(expr(s"lang_ngram_guess($quoted)"), lit("unknown")).as("lang_guess"))
  }
}
