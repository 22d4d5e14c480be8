package graft

import org.apache.spark.sql.functions._

import graft.ops.Neighborhood

/** Hot-bucket sorted-neighborhood: exact global ranks computed without any
  * single task holding a whole bucket, block-join pairing correctness. */
class NeighborhoodSpec extends SparkSpec {

  test("two-pass rank equals the naive per-bucket global rank") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // two buckets, shuffled insert order, duplicate sort keys included
    val rows = rng.shuffle(
      (0 until 800).map(i => (7L, i.toLong, f"k${rng.nextInt(200)}%03d")) ++
        (0 until 300).map(i => (9L, (1000 + i).toLong, f"k${rng.nextInt(50)}%03d")))
    val big = rows.toDF("bucket", "id", "sort")
    val got = Neighborhood.rankedWithinBuckets(big)
      .select("bucket", "id", "rn").as[(Long, Long, Long)].collect()
    val want = rows.groupBy(_._1).flatMap { case (bkt, rs) =>
      rs.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case ((_, id, _), i) => (bkt, id, i + 1L) }
    }.toSet
    assert(got.toSet === want)
  }

  test("no single task receives a whole degenerate bucket (50k equal sorts)") {
    import spark.implicits._
    val n = 50000
    val big = spark.range(n).select(lit(1L).as("bucket"),
      col("id"), lit("").as("sort")) // all-equal sort keys: worst case
    val ranked = Neighborhood.rankedWithinBuckets(big)
    val perPid = ranked.groupBy("pid").count().as[(Int, Long)].collect()
    assert(perPid.length > 1, "bucket must be split across partitions")
    assert(perPid.map(_._2).max < n, s"one task held the whole bucket: $perPid")
    // and the rank is still exact/global
    val rns = ranked.select(sum("rn"), countDistinct("rn")).head()
    assert(rns.getLong(0) === n.toLong * (n + 1) / 2)
    assert(rns.getLong(1) === n.toLong)
  }

  test("block-join pairing emits exactly the next-W neighbors, once each") {
    import spark.implicits._
    val n = 200
    val w = 8
    val big = (0 until n).map(i => (3L, i.toLong, f"s$i%04d")).toDF("bucket", "id", "sort")
    val got = Neighborhood.sortedNeighborhoodPairs(big, w)
      .select("src", "dst").as[(Long, Long)].collect().toSeq
    assert(got.size === got.toSet.size, "pairs must be emitted exactly once")
    val want = (for {
      r <- 0 until n
      d <- 1 to w if r + d < n
    } yield (r.toLong, (r + d).toLong)).toSet
    assert(got.toSet === want)
  }

  test("degenerate 50k-row bucket pairs in O(n·W), not O(n²)") {
    import spark.implicits._
    val n = 50000L
    val w = 4
    val big = spark.range(n).select(lit(1L).as("bucket"), col("id"), lit("x").as("sort"))
    val cnt = Neighborhood.sortedNeighborhoodPairs(big, w).count()
    // exact: sum over ranks of min(W, n-r) = n*W - W(W+1)/2
    assert(cnt === n * w - w.toLong * (w + 1) / 2)
  }
}
