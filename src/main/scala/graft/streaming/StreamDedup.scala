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

  /** Streaming NEAR-dup suppression: dedup key = the 64-bit simhash, so
    * small edits that leave the signature unchanged (whitespace/punctuation
    * drift, the templated-page case) collapse to one survivor in-stream.
    * This is the Hamming-distance-0 slice of near-dup — pairs at distance
    * ≥ 1 need candidate verification and belong to the batch
    * [[graft.ops.Dedup.simhashPairs]] pass downstream; state cost is
    * identical to [[exactDedup]] (one long key per doc within the horizon). */
  def simhashDedup(docs: DataFrame, textCol: String = "text",
      tsCol: String = "warc_ts", horizon: String = "24 hours"): DataFrame = {
    val outSchema = docs.schema.add("sim", org.apache.spark.sql.types.LongType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = docs.schema.fieldIndex(textCol)
    val withSim = docs.mapPartitions { it =>
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        val sim =
          if (t == null) 0L
          else graft.ops.Hashing.simhash(t.toLowerCase.split("\\W+").filter(_.nonEmpty))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ sim)
      }
    }(enc)
    withSim
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("sim")
  }
}
