package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** ANN operators: exact baseline vs LSH and IVF scale paths. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
    import spark.implicits._
    df.select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
  }

  test("brute-force top-k is deterministic and self-excluding") {
    val a = topkMap(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val b = topkMap(Similarity.bruteForceTopK(emb.repartition(7), queries, "vec_id", "embedding", 5))
    assert(a === b)
    assert(a.size === queries.count())
    a.foreach { case (q, cands) =>
      assert(cands.size === 5)
      assert(!cands.contains(q))
    }
  }

  test("IVF recall@5 >= 0.6 against the exact baseline, deterministic") {
    val exact = topkMap(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val ivf1 = topkMap(Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5))
    val ivf2 = topkMap(Similarity.ivfTopK(emb.repartition(5), queries, "vec_id", "embedding", 5))
    assert(ivf1 === ivf2, "IVF must be partition-count invariant")
    val recalls = exact.map { case (q, want) =>
      ivf1.get(q).map(got => got.toSet.intersect(want.toSet).size / 5.0).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean")
  }

  test("IVF with nProbe = nCells degenerates to the exact result") {
    val exact = topkMap(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val full = topkMap(Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 8))
    assert(full === exact)
  }

  test("LSH top-k candidates carry valid ranks and scores") {
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5)
    val rows = lsh.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rank") <= 5))
  }
}
