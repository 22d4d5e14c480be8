package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.pipeline.{Extract, ExtractorConfig}
import graft.schema.Triple

/** Structured Streaming face of the extractor (SURVEY.md §2.9 extension).
  *
  * The batch pipeline is stateless row-to-rows (prepare filters + one
  * mapPartitions), so the SAME code runs under `readStream`: new page files
  * landing in the table directory are processed incrementally, exactly-once,
  * with progress tracked in the checkpoint — the streaming twin of the
  * TableIO bucket-resume used in batch.
  *
  * `Trigger.AvailableNow` gives catch-up-then-stop semantics (the idiomatic
  * replacement for repeated batch runs); a continuous trigger is a config
  * change, not a code change.
  */
object StreamExtract {

  /** input_hint page schema for the streaming file source (streams must
    * declare their schema explicitly). */
  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)
  ))

  def readPages(spark: SparkSession, pagesDir: String): DataFrame =
    spark.readStream.schema(pageSchema).parquet(pagesDir)

  /** The batch extractor applied to a streaming DataFrame — identical
    * operator graph, incremental execution. */
  def triples(pages: DataFrame, cfg: ExtractorConfig = ExtractorConfig()): Dataset[Triple] =
    Extract.triples(pages, cfg)

  /** Run extraction over all currently-available files, then stop.
    * Restarting with the same checkpoint processes only NEW files. */
  def runAvailableNow(spark: SparkSession, pagesDir: String, outDir: String,
      checkpointDir: String, cfg: ExtractorConfig = ExtractorConfig()): StreamingQuery = {
    triples(readPages(spark, pagesDir), cfg)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked per-window triple rate: event-time aggregation on warc_ts
    * (1-hour tumbling windows, 2-hour lateness bound) — the monitoring
    * surface for a continuously-fed corpus. warc_ts rides through the
    * inference barrier so no stream-stream join is needed. */
  def tripleRate(pages: DataFrame, cfg: ExtractorConfig = ExtractorConfig()): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    // THE batch prepare (one definition of F2/F3/lang), with the event-time
    // column riding through for the watermark
    val base = Extract.prepare(pages, cfg, keep = Seq("warc_ts"))
      .select("url", "warc_ts", "text")
    base.as[(String, java.sql.Timestamp, String)]
      .mapPartitions { docs =>
        val (gaz, kernel) = graft.pipeline.ExtractorModel.get(cfg.kernel)
        docs.flatMap { case (url, ts, text) =>
          Extract.extractDoc(url, text, gaz, kernel, cfg).map(t => (t.relation, ts))
        }
      }
      .toDF("relation", "warc_ts")
      .withWatermark("warc_ts", "2 hours")
      .groupBy(window(col("warc_ts"), "1 hour"), col("relation"))
      .agg(count(lit(1)).as("triples"))
  }
}
