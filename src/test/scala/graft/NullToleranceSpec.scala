package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextStats}

/** Poison-pill tolerance: real web corpora carry null text/embeddings; every
  * dedup/ANN operator must degrade per-row, never fail the job. */
class NullToleranceSpec extends SparkSpec {

  private def docsWithNulls = {
    import spark.implicits._
    Seq(
      (Some(1L), Some("the quick brown fox jumps over the lazy dog " * 3)),
      (Some(2L), Some("the quick brown fox jumps over the lazy dog " * 3 + "tail")),
      (Some(3L), None: Option[String]), // null text
      (None: Option[Long], Some("orphan row with no id")),
      (Some(5L), Some("completely different content about something else " * 3))
    ).toDF("doc_id", "text")
  }

  private def vecsWithNulls = {
    import spark.implicits._
    Seq(
      (Some(1L), Some(Seq(1f, 0f, 0f, 0f))),
      (Some(2L), Some(Seq(0.99f, 0.1f, 0f, 0f))),
      (Some(3L), None: Option[Seq[Float]]), // null embedding
      (None: Option[Long], Some(Seq(0f, 1f, 0f, 0f))),
      (Some(5L), Some(Seq(0f, 0f, 1f, 0f)))
    ).toDF("vec_id", "embedding")
  }

  test("exact dedup keeps null-text docs (grouped as empty), drops null ids") {
    val got = Dedup.exact(docsWithNulls, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 5L))
    assert(got(3L) === 3L)
  }

  test("minhash LSH clusters despite null rows; null-text doc keeps itself") {
    val got = Dedup.minhashLsh(docsWithNulls, "doc_id", "text", threshold = 0.6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(got(3L) === 3L && got(5L) === 5L)
  }

  test("simhash, winnowing, jaccard tolerate nulls") {
    assert(Dedup.simhashPairs(docsWithNulls, "doc_id", "text", 10)
      .collect().forall(r => r.getLong(0) != 3L && r.getLong(1) != 3L))
    Dedup.winnowedOverlapPairs(docsWithNulls, "doc_id", "text").count() // no throw
  }

  test("embedding dedup (exact and LSH paths) and ANN tolerate null vectors") {
    val exact = Dedup.embeddingNearDup(vecsWithNulls, "vec_id", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact(1L) === 1L && exact(2L) === 1L && exact(3L) === 3L)
    val lsh = Dedup.embeddingNearDup(vecsWithNulls, "vec_id", "embedding", 0.9,
      localThreshold = 0L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh(2L) === 1L)
    val topk = Similarity.bruteForceTopK(vecsWithNulls,
      vecsWithNulls.filter(col("vec_id") === 1L), "vec_id", "embedding", k = 2)
    assert(topk.count() === 2) // nulls excluded from both sides
    Similarity.lshTopK(vecsWithNulls, vecsWithNulls.filter(col("vec_id") === 1L),
      "vec_id", "embedding", k = 2).count() // no throw
    Similarity.ivfTopK(vecsWithNulls, vecsWithNulls.filter(col("vec_id") === 1L),
      "vec_id", "embedding", k = 2, nCells = 2, trainSample = 4).count() // no throw
  }

  test("lang n-gram guess tolerates null text rows") {
    val got = TextStats.withLangNgram(docsWithNulls, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(3L) === "unknown")
    assert(got(1L) === "en")
  }
}
