package graft

import org.apache.spark.sql.functions.col

import graft.ops.{Dedup, Sampling, TextStats}

/** Supplementary benchmarks the FROZEN `Bench` harness cannot carry this
  * round (its hash is pinned): printed as ONE JSON line and mirrored to
  * `BENCH_extra.json`. Three lanes, each addressing a round-6 verdict ask:
  *
  *  - `kernel_probe`: the no-Spark [[graft.tools.KernelProbe]] thread-scaling
  *    control, so an extraction-throughput dip in the main bench is
  *    attributable (host contention moves BOTH lanes; a real regression
  *    moves only the Spark one).
  *  - `scale100x`: the five heavy-op 1M-doc / 500k-vector anchors re-run
  *    with the noise discipline the main bench's single-pass 100× tier
  *    lacks — TWO passes per op with the op ORDER rotated between passes
  *    (cold-start and neighbor-load windows cannot systematically land on
  *    the same op), per-op MIN and both raw passes reported. Ops, corpus
  *    generators, seeds and parameters are exactly the main bench's
  *    (`WebDocs` seeds 77/78, same thresholds), so the numbers adjudicate
  *    the frozen tier's single-pass reads.
  *  - `noop`: guide-§1.4 sink isolation for the heaviest battery queries —
  *    each is timed against the no-op sink (computes every column of every
  *    row, no count-path pruning), min of two passes.
  *
  * `SPARK_GRAFT_EXTRA_MODE` = all (default) | kernel | scale100 | noop
  * restricts the lanes; `SPARK_GRAFT_SF_DIR`/`SPARK_GRAFT_CPUS` as in Bench.
  */
object BenchExtra {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXTRA_MODE", "all")
    def on(m: String) = mode == "all" || mode == m
    val spark = SparkSessionFactory.local(cpus, "graft-benchextra")
    spark.range(1000).selectExpr("sum(id)").collect()

    // ---- lane 1: raw-JVM kernel control
    val kernelJson =
      if (!on("kernel")) """{"skipped":true}"""
      else {
        val m = graft.tools.KernelProbe.measure()
        f"""{"rows_per_sec_4":${m("rows_per_sec_4")}%.0f,""" +
          f""""rows_per_sec_16":${m("rows_per_sec_16")}%.0f,""" +
          f""""rows_per_sec_32":${m("rows_per_sec_32")}%.0f,""" +
          f""""eff_4_to_16":${m("eff_4_to_16")}%.3f}"""
      }

    // ---- lane 2: noise-controlled 100× anchors (min-of-2, rotated order)
    val scaleJson =
      if (!on("scale100")) """{"skipped":true}"""
      else {
        val docsN = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "10000").toLong * 100
        val vecsN = sys.env.getOrElse("SPARK_GRAFT_SCALE_VECS", "5000").toLong * 100
        val root = java.nio.file.Files.createTempDirectory("graft-benchextra").toString
        try {
          graft.synth.WebDocs.documents(spark, docsN, seed = 77).write.parquet(s"$root/docs")
          graft.synth.WebDocs.embeddings(spark, vecsN, seed = 78).write.parquet(s"$root/emb")
          def docs = spark.read.parquet(s"$root/docs")
          def emb = spark.read.parquet(s"$root/emb")
          // the main bench's phase-2c op list, parameters verbatim
          val ops: Seq[(String, () => Long)] = Seq(
            "lsh_minhash_dedup" -> (() => Dedup.minhashLsh(docs, "doc_id", "text",
              shingleN = 8, k = 16, bands = 4, threshold = 0.2).count()),
            "simhash_pairs" -> (() => Dedup.simhashPairs(docs, "doc_id", "text",
              maxHamming = 3).count()),
            "curation_pipeline" -> { () =>
              val gated = docs
                .filter(TextStats.qualityScore(col("text")) >= 0.5)
                .filter(TextStats.langGuess(col("text")) === "latin")
              val sampled = Sampling.hashStratified(gated, "lang", "doc_id",
                Map("en" -> 0.5, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0), salt = "graft")
              TextStats.tfidfTopK(Dedup.exactKeepers(sampled, "doc_id", "text"),
                "doc_id", "text", k = 3).count()
            },
            "winnow_overlap_pairs" -> (() => Dedup.winnowedOverlapPairs(docs,
              "doc_id", "text", k = 16, w = 8, minShared = 3,
              pairBudgetPerDoc = 64).count()),
            "emb_near_dup_lsh" -> (() => Dedup.embeddingNearDup(emb, "vec_id",
              "embedding", threshold = 0.45, localThreshold = 0L).count()))
          val rows = scala.collection.mutable.Map.empty[String, Long]
          def pass(order: Seq[(String, () => Long)]): Map[String, Double] =
            order.map { case (name, f) =>
              spark.sparkContext.setJobDescription(s"benchextra: $name @100x")
              val (r, s) = time(f())
              rows.get(name).foreach(prev => require(prev == r,
                s"$name@100x nondeterministic: $prev vs $r"))
              rows(name) = r
              name -> s
            }.toMap
          // rotation: pass 2 starts where pass 1 ended, so a cold first slot
          // or a hot neighbor window cannot bias the same op twice
          val p1 = pass(ops)
          val p2 = pass(ops.drop(ops.size / 2) ++ ops.take(ops.size / 2))
          val per = ops.map(_._1).map { n =>
            f""""$n":{"sec":${math.min(p1(n), p2(n))}%.2f,"passes":[${p1(n)}%.2f,${p2(n)}%.2f],""" +
              f""""rows":${rows(n)}}"""
          }.mkString(",")
          f"""{"docs":$docsN,"vecs":$vecsN,$per}"""
        } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      }

    // ---- lane 3: noop-sink isolation for the heaviest battery queries
    val noopJson =
      if (!on("noop")) """{"skipped":true}"""
      else {
        val names = sys.env.getOrElse("SPARK_GRAFT_EXTRA_NOOP",
          "link_compaction,link_incremental,kg_e2e_pipeline,kg_metrics_per_type," +
            "kg_eval_pr,curation_pipeline,emb_near_dup_lsh,lsh_minhash_dedup," +
            "winnow_overlap_pairs,text_tfidf_topk").split(",").map(_.trim)
        val per = names.map { n =>
          def once(): Double = {
            spark.sparkContext.setJobDescription(s"benchextra noop: $n")
            time(SparkEntry.queries(n)(spark, sfDir)
              .write.format("noop").mode("overwrite").save())._2
          }
          val s1 = once(); val s2 = once()
          f""""$n":${math.min(s1, s2)}%.3f"""
        }.mkString(",")
        s"""{$per}"""
      }

    val line = s"""{"kernel_probe":$kernelJson,"scale100x":$scaleJson,""" +
      s""""noop":$noopJson,"sf":"$sfDir","cpus":$cpus}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_EXTRA_FILE", "BENCH_extra.json")),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[benchextra] sidecar write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
