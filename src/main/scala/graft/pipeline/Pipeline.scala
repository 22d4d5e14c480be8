package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.TableIO
import graft.link.Linker
import graft.schema.Triple

/** End-to-end KG materialization with per-partition lineage + resume
  * (north_star: extract → link/canonicalize → graph-materialize, resumable
  * from checkpoint).
  *
  * Stage "extract" is embarrassingly parallel and resumes at bucket grain:
  * input pages whose url-bucket is already committed are filtered out BEFORE
  * the inference barrier, so a resumed run re-reads only pending work.
  * Stage "canonicalize" is a corpus-global op (connected components) and
  * resumes at stage grain (skip if committed for the same input snapshot).
  */
object Pipeline {

  final case class Config(
      workDir: String,
      nBuckets: Int = 64,
      extractor: ExtractorConfig = ExtractorConfig(),
      inputSnapshot: String = "pages-v1")

  def triplesDir(cfg: Config): String = s"${cfg.workDir}/triples"
  def canonicalDir(cfg: Config): String = s"${cfg.workDir}/canonical_triples"

  /** Runs (or resumes) the extract stage. Returns buckets newly committed. */
  def runExtract(pages: DataFrame, cfg: Config): Int = {
    val pending = TableIO.pendingInput(pages, "url", triplesDir(cfg), "extract",
      cfg.nBuckets, cfg.inputSnapshot)
    val triples = Extract.triples(pending, cfg.extractor)
    TableIO.writeStage(triples.toDF(), triplesDir(cfg), "extract", "url",
      cfg.nBuckets, cfg.inputSnapshot)
  }

  /** Runs (or skips) the canonicalize stage over the full triples table. */
  def runCanonicalize(spark: SparkSession, cfg: Config): Int = {
    val done = TableIO.readSnapshot(spark, canonicalDir(cfg))
      .exists(s => s.stage == "canonicalize" && s.inputSnapshot == cfg.inputSnapshot &&
        s.buckets.nonEmpty)
    if (done) 0
    else {
      import spark.implicits._
      val triples = TableIO.readStage(spark, triplesDir(cfg))
        .select("url", "subjectType", "subject", "relation", "objectType", "obj")
        .as[Triple]
      val canonical = Linker.canonicalTriples(triples)
      TableIO.writeStage(canonical.toDF(), canonicalDir(cfg), "canonicalize",
        "subject", math.max(cfg.nBuckets / 8, 1), cfg.inputSnapshot)
    }
  }

  /** Full run (idempotent / resumable). */
  def run(pages: DataFrame, cfg: Config): Unit = {
    runExtract(pages, cfg)
    runCanonicalize(pages.sparkSession, cfg)
  }
}
