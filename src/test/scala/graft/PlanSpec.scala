package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.pipeline.{Extract, ExtractorConfig}
import graft.synth.Corpus

/** Physical-plan assertions — the properties that decide 100TB viability:
  * column pruning (html binary never read), partition pruning on lang,
  * broadcast joins for the tiny dims, filter placement before the
  * mapPartitions inference barrier. */
class PlanSpec extends SparkSpec {

  private lazy val pagesDir: String = {
    val dir = Files.createTempDirectory("graft-plan").toString + "/pages"
    Corpus.pages(spark, 300, seed = 42, noisyFrac = 0.0).toDF()
      .write.partitionBy("lang").parquet(dir)
    dir
  }

  private def leafScans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collectLeaves().collect { case f: FileSourceScanExec => f }
  }

  test("extract path reads only url+text: html/warc_ts pruned at the scan") {
    val pages = spark.read.parquet(pagesDir)
    val prepared = Extract.prepare(pages, ExtractorConfig())
    val scans = leafScans(prepared)
    assert(scans.nonEmpty)
    val readCols = scans.flatMap(_.requiredSchema.fieldNames).toSet
    assert(readCols === Set("url", "text"),
      s"scan should read only url,text but reads $readCols")
  }

  test("lang filter prunes partitions at planning time") {
    val pages = spark.read.parquet(pagesDir)
    val prepared = Extract.prepare(pages, ExtractorConfig(langFilter = Some("zh")))
    val scans = leafScans(prepared)
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "lang=zh should appear as a partition filter, not a row filter")
    // and the en partition's rows are never surfaced
    val zhOnly = prepared.select("url").count()
    val all = pages.count()
    assert(zhOnly < all)
  }

  test("non-partition filters are pushed to the scan (PushedFilters)") {
    val pages = spark.read.parquet(pagesDir)
    val filtered = pages.filter(col("url") > "https://synth.test/42/000000000100")
      .select("url")
    val scans = leafScans(filtered)
    assert(scans.exists(_.dataFilters.nonEmpty), "url predicate should reach the scan")
  }

  test("relation-dim join is a broadcast hash join (no shuffle of the fact side)") {
    val plan = SparkEntry.queries("j2_relation_fanout")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("metric aggregation plans as partial+final hash aggregate") {
    val plan = SparkEntry.queries("a1_metric_counters")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "expected partial+final")
  }

  test("a5 early-stop: all windows share one run-keyed exchange (no per-run re-shuffle)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val raw = SparkEntry.queries("a5_early_stop")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val plan = raw match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size >= 3, s"expected the improved/best/stop windows, got ${windows.size}")
    // one exchange for the history groupBy, ONE for every run-partitioned
    // window — a sweep of N runs costs two shuffles total, not 1 + windows
    assert(exchanges.size <= 2,
      s"expected <= 2 shuffles (agg + shared run key), got ${exchanges.size}:\n${plan.toString.take(2000)}")
  }

  test("curation pipeline: gates fuse into one scan-side filter; runtime executes two scans") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("curation_pipeline")(spark, "/root/testdata/sf0.001")
    // (a) static: quality + script + sampling predicates land in a SINGLE
    // Filter directly over the relation — no shuffle before any gate
    val fusedGate = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation] =>
        f.condition.sql
    }
    assert(fusedGate.exists(c =>
      c.contains("md5(") && c.contains("0.5") && c.toLowerCase.contains("x7f")),
      s"expected one scan-side filter carrying all three gates, got:\n${fusedGate.mkString("\n---\n")}")
    // (b) runtime: the finalized adaptive plan executes the gated scan
    // TWICE (tfidf's lazy corpus-count branch + the main branch) with the
    // duplicated tf exchange collapsed by AQE stage reuse — NOT the 4 scans
    // the agg+self-join keeper form planned
    df.collect()
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = fin.toString
    val scans = "Scan parquet".r.findAllIn(s).size
    assert(scans <= 2, s"gated scan must execute at most twice, saw $scans:\n${s.take(2000)}")
    assert(s.contains("ReusedExchange"), "expected AQE to reuse the duplicated tf exchange")
  }

  test("whole-stage codegen covers the relational prep before the barrier") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val pages = spark.read.parquet(pagesDir)
    val prepared = Extract.prepare(pages, ExtractorConfig())
    val codegenSpans = prepared.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty, prepared.queryExecution.executedPlan.toString.take(1500))
  }
}
