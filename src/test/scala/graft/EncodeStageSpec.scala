package graft

import java.nio.file.Files

import graft.eval.{EvalRun, Metrics}
import graft.io.TableIO
import graft.pipeline.Pipeline
import graft.synth.Corpus

/** Production encoded_samples stage (S4 — the reference's .npy feature
  * store): encode once via TableIO.writeStage, eval from the persisted
  * stage, resume skips committed buckets. */
class EncodeStageSpec extends SparkSpec {

  test("eval over the persisted stage reproduces the direct path's metrics; " +
      "re-run is a committed-bucket no-op") {
    val work = Files.createTempDirectory("graft-encstage").toString
    val cfg = Pipeline.Config(workDir = work, nBuckets = 8,
      inputSnapshot = "pages-v1", completeInput = true)
    val pages = Corpus.pages(spark, 150, seed = 42, noisyFrac = 0.0).toDF()
    val gold = Corpus.gold(spark, 150, seed = 42, noisyFrac = 0.0)

    val first = Pipeline.runEncode(pages, gold, cfg)
    assert(first.newBuckets === 8)
    assert(first.metrics("encode_samples_out") > 0)
    assert(TableIO.auditStage(spark, Pipeline.encodedDir(cfg), "url").isEmpty)

    // identical metrics: persisted-stage eval vs the direct recompute path
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val fromStage = EvalRun.perTypeMetricsFromStage(spark, Pipeline.encodedDir(cfg))
    val direct = EvalRun.perTypeMetrics(pages, gold)
    assert(rows(fromStage) === rows(direct))

    // fully-committed resume: true no-op (no buckets, no observation hang)
    val again = Pipeline.runEncode(pages, gold, cfg)
    assert(again.newBuckets === 0)
    assert(again.metrics.isEmpty)

    // per-sample eval from the stage matches the direct dump too
    val dumpStage = Metrics.perSampleEval(
      EvalRun.evalSamplesFromStage(spark, Pipeline.encodedDir(cfg)))
    val dumpDirect = Metrics.perSampleEval(EvalRun.evalSamples(pages, gold))
    assert(rows(dumpStage) === rows(dumpDirect))
  }

  test("sparse stage (more buckets than urls) still reaches the no-op fast path") {
    val work = Files.createTempDirectory("graft-encsparse").toString
    // 30 urls over 64 buckets: many buckets are genuinely empty —
    // completeInput commits them as (0,0) so the resume is a true no-op
    // instead of re-running QA prep + encode forever
    val cfg = Pipeline.Config(workDir = work, nBuckets = 64,
      inputSnapshot = "pages-v1", completeInput = true)
    val pages = Corpus.pages(spark, 30, seed = 7, noisyFrac = 0.0).toDF()
    val gold = Corpus.gold(spark, 30, seed = 7, noisyFrac = 0.0)
    assert(Pipeline.runEncode(pages, gold, cfg).newBuckets === 64)
    assert(TableIO.auditStage(spark, Pipeline.encodedDir(cfg), "url").isEmpty)
    val again = Pipeline.runEncode(pages, gold, cfg)
    assert(again.newBuckets === 0)
    assert(again.metrics.isEmpty, "fast path must not evaluate (or observe) the plan")
  }
}
