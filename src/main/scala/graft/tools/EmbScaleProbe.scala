package graft.tools

import graft.ops.Dedup

/** One-off paired measurement of the embedding-LSH geometry on the bench's
  * synthetic corpus — the tool that lets two geometries be timed in the SAME
  * host window (the scale bench's round-over-round numbers span windows whose
  * throughput differs by ~2×, so an isolated geometry delta needs a pair):
  * `runMain graft.tools.EmbScaleProbe <nVecs> [bits bands]`
  * — `bits bands` pins the geometry (e.g. `3630 165` reproduces the
  * uncorrected r6 solution at 500k vectors); omitted = the adaptive
  * dispersion-corrected solver. Prints one JSON line with wall time and the
  * run's [[Dedup.LshStats]] counters. */
object EmbScaleProbe {
  def main(args: Array[String]): Unit = {
    // a lone `bits` must NOT silently fall back to the adaptive solver — in
    // a paired A/B measurement the output would be attributed to a geometry
    // that never ran (the operator requires the same both-or-neither pin)
    require(args.length == 1 || args.length == 3,
      "usage: EmbScaleProbe <nVecs> [bits bands] — pin BOTH bits and bands, or neither")
    val n = args(0).toLong
    val (bits, bands) =
      if (args.length == 3) (args(1).toInt, args(2).toInt) else (-1, -1)
    val spark = graft.SparkSessionFactory.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-emb-probe")
    // SPARK_GRAFT_PROBE_STAGES=1: print one JSON line per completed stage
    // (callsite name + wall seconds + task count) — the phase decomposition
    // of the operator (hashing vs fan-out aggregation vs verify join) with
    // no product-code instrumentation
    if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for { s <- i.submissionTime; c <- i.completionTime } yield c - s)
            .getOrElse(0L)
          println(f"""{"stage":${i.stageId},"sec":${ms / 1000.0}%.1f,""" +
            f""""tasks":${i.numTasks},"name":"${i.name.replace('"', '\'').take(90)}"}""")
        }
      })
    }
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-emb-probe").toString
      try {
        graft.synth.WebDocs.embeddings(spark, n, seed = 78).write.parquet(s"$dir/emb")
        val emb = spark.read.parquet(s"$dir/emb")
        var stats: Option[Dedup.LshStats] = None
        val t0 = System.nanoTime()
        // the pairs path only (no CC keeper): the geometry decides candidate
        // volume and the verify join, which is exactly what the pair isolates
        val rows = Dedup.embeddingCosinePairsLsh(emb, "vec_id", "embedding",
          threshold = 0.45, bits = bits, bands = bands,
          onStats = Some(s => stats = Some(s))).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val s = stats.get
        println(f"""{"n":${s.n},"bits":${s.bandBits * s.bands},""" +
          f""""band_bits":${s.bandBits},"bands":${s.bands},"sec":$sec%.2f,""" +
          f""""rows":$rows,"candidates":${s.candidates},""" +
          f""""verified":${s.verified},""" +
          f""""cand_per_row":${s.candidates.toDouble / math.max(s.n, 1)}%.2f,""" +
          f""""design_recall":${s.expectedRecall}%.3f}""")
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    } finally spark.stop()
  }
}
