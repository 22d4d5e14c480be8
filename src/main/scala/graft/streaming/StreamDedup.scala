package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextStats

/** Streaming exact deduplication — the Structured Streaming twin of
  * [[graft.ops.Dedup.exact]] for a continuously-fed corpus (SURVEY.md §2.9
  * extension; the batch fingerprint is reused verbatim, so batch and stream
  * agree on what counts as a duplicate).
  *
  * State design (100 TB stream): `dropDuplicatesWithinWatermark` keys state
  * by the 64-bit content fingerprint only (16 bytes/entry-ish, not the
  * document), and the event-time watermark EVICTS entries once no duplicate
  * can still arrive — state is bounded by horizon × ingest rate instead of
  * growing with corpus lifetime. The documented trade: a copy arriving more
  * than `horizon` after its original is admitted again (re-deduplicated by
  * the batch pass downstream).
  */
object StreamDedup {

  /** Keep the first-arriving document per content fingerprint.
    *
    * @param docs streaming DataFrame with `tsCol` (event time) and `textCol`
    * @param horizon watermark delay bounding both lateness and dedup state
    */
  def exactDedup(docs: DataFrame, textCol: String = "text",
      tsCol: String = "warc_ts", horizon: String = "24 hours"): DataFrame =
    docs
      .withColumn("fp", TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup suppression: dedup key = the 64-bit content simhash
    * ([[graft.ops.Hashing.simhashText]] — lowercased char trigrams, so the
    * signature is meaningful on CJK and punctuation-only text), so small
    * edits that leave the signature unchanged (whitespace/punctuation drift,
    * the templated-page case) collapse to one survivor in-stream. This is
    * the Hamming-distance-0 slice of near-dup — pairs at distance ≥ 1 need
    * candidate verification and belong to the batch
    * [[graft.ops.Dedup.simhashPairs]] pass downstream; state cost is
    * identical to [[exactDedup]] (one long key per doc within the horizon).
    *
    * Degenerate docs (null/empty text) have NO content signature: keying
    * them by a shared constant would silently drop every contentless doc
    * after the first. They dedup by the exact content hash instead, in a
    * key space disambiguated by the `degenerate` flag column — identical
    * empties still collapse (they ARE exact dups), distinct docs never do. */
  def simhashDedup(docs: DataFrame, textCol: String = "text",
      tsCol: String = "warc_ts", horizon: String = "24 hours"): DataFrame = {
    val outSchema = docs.schema
      .add("sim", org.apache.spark.sql.types.LongType)
      .add("degenerate", org.apache.spark.sql.types.BooleanType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = docs.schema.fieldIndex(textCol)
    val withSim = docs.mapPartitions { it =>
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        val features = graft.ops.Hashing.simhashFeatures(t)
        val degenerate = features.isEmpty
        // fallback hashes the NORMALIZED text (lower/collapse/trim — the
        // exact fingerprint's own normalization), so blank variants collapse
        // exactly as exactDedup would collapse them, and nothing else does
        val sim =
          if (degenerate)
            graft.ops.Hashing.hash64(
              if (t == null) "" else t.toLowerCase.replaceAll("\\s+", " ").trim)
          else graft.ops.Hashing.simhash(features)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ sim :+ degenerate)
      }
    }(enc)
    withSim
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("sim", "degenerate")
  }
}
