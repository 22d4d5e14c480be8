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
}
