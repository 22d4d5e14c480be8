package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted aggregation must be bit-identical to the direct aggregation. */
class SkewSpec extends SparkSpec {

  test("saltedCountSum equals direct groupBy on a zipf-hot key distribution") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // 90% of rows share one hot key
    val rows = (0 until 20000).map { i =>
      val key = if (rng.nextDouble() < 0.9) "hot" else s"cold-${rng.nextInt(50)}"
      (key, i.toLong, (i % 100).toLong)
    }
    val df = rows.toDF("k", "id", "v")
    val salted = Skew.saltedCountSum(df, "k", "v", "id", salts = 32)
      .select(col("k"), col("cnt"), col("sum_value").cast("long"))
      .as[(String, Long, Long)].collect().map { case (k, c, s) => k -> ((c, s)) }.toMap
    val direct = df.groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))
      .as[(String, Long, Long)].collect().map { case (k, c, s) => k -> ((c, s)) }.toMap
    assert(salted === direct)
  }

  test("cappedBuckets drops oversized buckets and reports them") {
    import spark.implicits._
    val df = (0 until 100).map(i => (if (i < 80) "big" else s"b$i", i)).toDF("bucket", "v")
    val (kept, dropped) = Skew.cappedBuckets(df, "bucket", cap = 50)
    assert(kept.filter(col("bucket") === "big").count() === 0)
    assert(kept.count() === 20)
    assert(dropped.as[String].collect().toSeq === Seq("big"))
  }
}
