package graft

import java.nio.file.Files

import graft.io.TableIO
import graft.pipeline.Pipeline
import graft.sources.WarcIngest
import graft.synth.Corpus

/** The north-star composition (`kg_e2e_pipeline`): WET archive → ingest →
  * extract → link → materialized canonical table, with checkpoint/resume
  * across a simulated mid-pipeline kill. */
class PipelineE2ESpec extends SparkSpec {

  test("a run killed after extract resumes without re-extracting; " +
      "the finished pipeline re-runs as a no-op; output equals the direct path") {
    val root = Files.createTempDirectory("graft-e2e-spec").toString
    val wetDir = s"$root/wet"
    val docs = (0L until 40L).map(i => Corpus.buildDoc(i, seed = 23, noisyFrac = 0.0))
    WarcIngest.writeWetRecords(wetDir, "e2e.wet",
      docs.map(d => (d.page.url, "zho", d.page.text)))
    val pages = WarcIngest.readWet(spark, wetDir)
    val cfg = Pipeline.Config(s"$root/work", nBuckets = 8,
      inputSnapshot = "wet-e2e-spec", completeInput = true)

    // phase 1 — the "killed" run: extract commits its lineage, link never starts
    val e1 = Pipeline.runExtract(pages, cfg)
    assert(e1.newBuckets === 8, "completeInput commits every bucket, empty ones as (0,0)")
    assert(e1.metrics("extract_triples_out") > 0)
    assert(TableIO.readSnapshot(spark, Pipeline.canonicalDir(cfg)).isEmpty,
      "the kill happened before canonicalize — no canonical manifest may exist")

    // phase 2 — resume: extract takes the fully-committed fast path (zero
    // new buckets AND zero metrics — the kernel plan is never evaluated),
    // canonicalize does its work
    val e2 = Pipeline.runExtract(pages, cfg)
    assert(e2.newBuckets === 0 && e2.metrics.isEmpty,
      "resume after the kill must not re-run any extract work")
    val c2 = Pipeline.runCanonicalize(spark, cfg)
    assert(c2.newBuckets > 0 && c2.metrics("link_canonical_out") > 0)

    // phase 3 — fully committed: the whole pipeline is a no-op
    assert(Pipeline.run(pages, cfg) === Map.empty,
      "a finished pipeline must re-run without doing any stage work")

    // the materialized table equals direct (non-staged) extraction + linking
    val cols = Seq("subjectId", "subject", "subjectType", "relation",
      "objectId", "obj", "objectType", "urls")
    val viaPipeline = TableIO.readStage(spark, Pipeline.canonicalDir(cfg))
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    import spark.implicits._
    val direct = graft.link.Linker.canonicalTriples(
      graft.pipeline.Extract.triples(
        docs.map(d => (d.page.url, d.page.text, "zh"))
          .toDF("url", "text", "lang")))
      .toDF().selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(viaPipeline === direct,
      "staging + resume must be invisible in the materialized graph")
  }
}
