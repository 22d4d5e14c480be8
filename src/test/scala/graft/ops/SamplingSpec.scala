package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hash-stratified Bernoulli sampling — determinism, nesting, and the
  * threshold arithmetic. */
class SamplingSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0 until 2000).map { i =>
      (i.toLong, Seq("en", "de", "fr", "zh")(i % 4), s"doc $i")
    }.toDF("id", "lang", "text")
  }

  test("hexThreshold: edges and quarter points") {
    def thr(f: Double): String = Sampling.hexThreshold(f)
    assert(thr(0.0) === "0" * 32)
    assert(thr(1.0) === "g") // above every hex digest => keep all
    assert(thr(0.25) === "4" + "0" * 31)
    assert(thr(0.5) === "8" + "0" * 31)
    assert(thr(0.75) === "c" + "0" * 31)
    assert(thr(1.0 / 16) === "1" + "0" * 31)
    assertThrows[IllegalArgumentException](thr(1.5))
  }

  test("deterministic across partitionings; unlisted stratum dropped") {
    val fr = Map("en" -> 0.5, "de" -> 1.0, "zh" -> 0.0) // fr unlisted
    val a = Sampling.hashStratified(corpus, "lang", "id", fr)
      .select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashStratified(corpus.repartition(17), "lang", "id", fr)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq, "verdict must not depend on partitioning")
    val langs = Sampling.hashStratified(corpus, "lang", "id", fr)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("fr"), "unlisted stratum must be dropped")
    assert(!langs.contains("zh"), "fraction 0 keeps nothing")
    // de at 1.0 keeps the whole stratum
    val deKept = Sampling.hashStratified(corpus, "lang", "id", fr)
      .filter(col("lang") === "de").count()
    assert(deKept === 500L)
  }

  test("fractions nest: the 0.25 sample is a subset of the 0.5 sample") {
    def ids(f: Double): Set[Long] =
      Sampling.hashStratified(corpus, "lang", "id", Map("en" -> f))
        .select("id").collect().map(_.getLong(0)).toSet
    val half = ids(0.5)
    val quarter = ids(0.25)
    assert(quarter.subsetOf(half),
      s"staged down-sampling must not re-roll: ${(quarter -- half).take(5)}")
    // and the sizes are binomial around fraction x 500
    assert(math.abs(half.size - 250) < 60, s"0.5 of 500 gave ${half.size}")
    assert(math.abs(quarter.size - 125) < 50, s"0.25 of 500 gave ${quarter.size}")
  }

  test("hexThreshold is monotone in the fraction — the nesting invariant's root") {
    val rnd = new scala.util.Random(42)
    val fs = (Seq.fill(500)(rnd.nextDouble()) ++ Seq(0.0, 1e-12, 0.999999, 1.0)).sorted
    fs.sliding(2).foreach {
      case Seq(a, b) =>
        // equal-length lowercase hex ⇒ lexicographic == numeric; "g" tops all
        assert(Sampling.hexThreshold(a) <= Sampling.hexThreshold(b),
          s"thresholds must not reorder: $a vs $b")
      case _ =>
    }
    assert(Sampling.hexThreshold(1.0) > "f" * 32)
  }

  test("gate is stateless-streaming-safe: stream verdicts equal batch verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0L until 500L).map(i => (i, Seq("en", "de")(i.toInt % 2)))
    val fr = Map("en" -> 0.5, "de" -> 0.25)

    val ms = MemoryStream[(Long, String)]
    ms.addData(rows: _*)
    val q = Sampling.hashStratified(ms.toDF.toDF("id", "lang"), "lang", "id", fr)
      .writeStream.format("memory").queryName("samp_gate").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamIds = spark.table("samp_gate").select("id").collect().map(_.getLong(0)).toSet

    val batchIds = Sampling.hashStratified(rows.toDF("id", "lang"), "lang", "id", fr)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(streamIds === batchIds,
      "the content-hash gate must give identical verdicts in stream and batch")
    assert(streamIds.nonEmpty && streamIds.size < rows.size)
  }

  test("null keys and null strata are dropped, not crashed") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("en")), (None, Some("en")), (Some(2L), None)
    ).toDF("id", "lang")
    val kept = Sampling.hashStratified(df, "lang", "id", Map("en" -> 1.0))
      .collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("plan is a scan + filter: no exchange anywhere") {
    val plan = Sampling.hashStratified(corpus, "lang", "id", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must be map-side only:\n${plan.take(1500)}")
  }
}
