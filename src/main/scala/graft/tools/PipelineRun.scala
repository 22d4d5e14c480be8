package graft.tools

import org.apache.spark.sql.SparkSession

import graft.io.TableIO
import graft.pipeline.Pipeline
import graft.synth.Corpus

/** CLI driver for the full KG pipeline with resume:
  * `runMain graft.tools.PipelineRun <workDir> <nDocs> [bucketLimit]`
  * — `bucketLimit` restricts the input to buckets < limit (simulates an
  * interrupted run); a later invocation without it resumes the rest.
  * Prints stage stats + lineage audit. */
object PipelineRun {
  def main(args: Array[String]): Unit = {
    val workDir = args(0)
    val nDocs = args(1).toLong
    val bucketLimit = if (args.length > 2) Some(args(2).toInt) else None

    val spark = graft.SparkSessionFactory.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-pipeline")

    val cfg = Pipeline.Config(workDir, nBuckets = 16)
    // cached: pendingInput.count, extract, and encode each act on this frame
    // — without the cache the synthetic generation pass re-runs per action
    val all = Corpus.pages(spark, nDocs, seed = 42, noisyFrac = 0.02).toDF().cache()
    val pages = bucketLimit.fold(all)(l => all.filter(TableIO.bucketCol("url", 16) < l))

    val pendingBefore = TableIO.pendingInput(pages, "url", Pipeline.triplesDir(cfg),
      "extract", cfg.nBuckets, cfg.inputSnapshot).count()
    val extractRun = Pipeline.runExtract(pages, cfg)
    // canonicalize is safe on a PARTIAL extract too: its snapshot is keyed
    // to the extract lineage signature, so a later fuller extract
    // invalidates and rebuilds it (Pipeline.runCanonicalize)
    val canonRun = Pipeline.runCanonicalize(spark, cfg)
    // S4 feature-store stage: QA samples encoded once, persisted, resumable
    val gold = Corpus.gold(spark, nDocs, seed = 42, noisyFrac = 0.02)
    val encodeRun = Pipeline.runEncode(pages, gold, cfg)
    val triples = TableIO.readStage(spark, Pipeline.triplesDir(cfg)).count()
    val audit = TableIO.auditStage(spark, Pipeline.triplesDir(cfg), "url")
    val canon = TableIO.readStage(spark, Pipeline.canonicalDir(cfg)).count()
    val encoded = TableIO.readStage(spark, Pipeline.encodedDir(cfg)).count()
    val encAudit = TableIO.auditStage(spark, Pipeline.encodedDir(cfg), "url")
    val stageMetrics = (extractRun.metrics ++ canonRun.metrics ++ encodeRun.metrics)
      .toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")
    println(s"[pipeline] pendingInputRows=$pendingBefore newBuckets=${extractRun.newBuckets} " +
      s"triplesTotal=$triples canonicalNewBuckets=${canonRun.newBuckets} canonicalRows=$canon " +
      s"encodeNewBuckets=${encodeRun.newBuckets} encodedRows=$encoded " +
      s"$stageMetrics auditBadTripleBuckets=${audit.mkString(",")} " +
      s"auditBadEncodeBuckets=${encAudit.mkString(",")} " +
      s"ok=${audit.isEmpty && encAudit.isEmpty}")
    spark.stop()
  }
}
