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
}
