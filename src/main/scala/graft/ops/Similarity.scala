package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale path: brute-force cosine top-k is the exact baseline (broadcast the
  * small query side — O(corpus) scan, no corpus shuffle). The LSH-bucketed
  * variant (random-hyperplane signs) prunes the corpus side to matching
  * buckets, turning the crossJoin into an equi-join keyed by signature
  * prefix — the IVF-style route at 10^9+ vectors.
  */
object Similarity {

  /** Cosine similarity between two array<float|double> columns, computed in
    * double precision via native higher-order functions (no UDF). */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, v => v.cast("double"))
    val dot = aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(d(b), lit(0.0), (acc, x) => acc + x * x))
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact brute-force top-k: for every query vector, the k nearest corpus
    * vectors by cosine. Query side is broadcast — corpus never shuffles.
    * Tie-breaking is deterministic: (rounded score desc, corpus id asc).
    *
    * Scale shape: scoring stays where the corpus rows are; each partition
    * keeps only its LOCAL top-k per query (bounded heap), so the only
    * exchange is over ≤ k × partitions × queries survivor rows — never the
    * full corpus×queries scored set. The final ranking window runs over
    * that small survivor set only. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // ids ride through the bounded heap as longs; fail fast on non-integral
    // id columns instead of silently null-casting them (hash or project a
    // numeric id first — see mm_feature_ann's xxhash64(url))
    Seq(corpus, queries).foreach { d =>
      import org.apache.spark.sql.types._
      val ok = d.schema(idCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"bruteForceTopK needs an integral id column; " +
        s"'$idCol' is ${d.schema(idCol).dataType}")
    }
    val c = corpus.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"), col("score"))
      .as[(Long, Long, Double)]
    // per-partition bounded top-k: worst element first, so `head` is the
    // eviction candidate; ordering mirrors the final (score desc, id asc)
    val partial = scored.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      // PriorityQueue.head is the MAX per ordering; make "worse" the max:
      // lowest score first, then highest id among equal scores
      val worstFirst = Ordering.by[(Double, Long), (Double, Long)] {
        case (s, id) => (-s, id)
      }
      it.foreach { case (qid, cid, s) =>
        val h = heaps.getOrElseUpdate(qid,
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        if (h.size < k) h.enqueue((s, cid))
        else {
          val (ws, wid) = h.head
          if (s > ws || (s == ws && cid < wid)) { h.dequeue(); h.enqueue((s, cid)) }
        }
      }
      heaps.iterator.flatMap { case (qid, h) => h.iterator.map(e => (qid, e._2, e._1)) }
    }.toDF("query_id", "corpus_id", "score")
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rank"))
  }

  /** Random-hyperplane sign signature (LSH for cosine): `bits` sign bits
    * from deterministic pseudo-random hyperplanes derived from the element
    * index — native expressions only. */
  def signBits(vec: Column, bits: Int): Column = {
    // hyperplane h_b[i] = sin(splitmix-ish(i, b)) in [-1, 1], folded inline:
    // deterministic, engine-independent, codegen'd
    val sigs = (0 until bits).map { b =>
      val dot = aggregate(
        zip_with(transform(vec, v => v.cast("double")),
          sequence(lit(0), size(vec) - 1),
          (x, i) => x * sin((i.cast("double") + lit(1.0)) * lit((b + 1) * 12.9898) + lit(78.233))),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    sigs.reduce(_.bitwiseOR(_))
  }

  /** The deterministic hyperplane matrix used by [[signBits]] /
    * [[signBitsLocal]]: h(b)(i) = sin((i+1)·(b+1)·12.9898 + 78.233). The
    * matrix is a constant per (dim, bits) — hoist it out of per-row loops
    * (the sin() calls dominate otherwise: bits × dim transcendentals/row). */
  def hyperplanes(dim: Int, bits: Int): Array[Array[Double]] =
    Array.tabulate(bits)(b =>
      Array.tabulate(dim)(i => math.sin((i + 1.0) * ((b + 1) * 12.9898) + 78.233)))

  /** Executor-JVM-shared [[hyperplanes]] cache for hot hashing loops. The
    * matrix is a deterministic constant per (dim, bits) but was built once
    * PER TASK — ~3 MB of tabulated sin() at the embedding-LSH cap geometry.
    * Sharing one read-only copy per JVM removes that per-task build; on the
    * 500k-vector probe (long tasks, build amortized) wall-time was measured
    * NEUTRAL, so this is allocation/latency hygiene that pays in
    * short-task regimes (many small partitions), not a throughput claim.
    * Deterministic + read-only, so a computeIfAbsent race is harmless; the
    * cache is capped at 16 geometries (a job uses a handful) — past that,
    * new geometries build per call rather than evicting under concurrency. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  def sharedHyperplanes(dim: Int, bits: Int): Array[Array[Double]] = {
    val k = (dim, bits)
    val cached = planeCache.get(k)
    if (cached != null) cached
    else {
      val built = hyperplanes(dim, bits)
      // cap enforced UNDER the lock (a bare size-check-then-insert raced:
      // concurrent first builds of distinct geometries could grow the
      // never-evicted cache past 16 entries); entries are deterministic, so
      // callers that lose the race just use their own freshly built copy
      planeCache.synchronized {
        if (planeCache.size < 16) planeCache.putIfAbsent(k, built)
      }
      val now = planeCache.get(k)
      if (now != null) now else built
    }
  }

  /** Plain-Scala twin of [[signBits]] (identical hyperplanes and bit layout)
    * for hot mapPartitions paths where per-row primitive loops beat the
    * interpreted higher-order-function expression. Pass a precomputed
    * [[hyperplanes]] matrix when calling per row. */
  def signBitsLocal(v: Array[Double], bits: Int,
      planes: Array[Array[Double]] = null): Long = {
    val h = if (planes != null) planes else hyperplanes(v.length, bits)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val hb = h(b)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * hb(i); i += 1 }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** One centroid-update step shared by both trainers: divide accumulated
    * sums by counts in place; an EMPTY cell keeps its previous centroid. */
  private def updateCentroids(prev: Array[Array[Double]],
      sums: Array[Array[Double]], counts: Array[Long]): Array[Array[Double]] =
    prev.indices.map { c =>
      if (counts(c) == 0) prev(c)
      else {
        val out = sums(c)
        var i = 0
        while (i < out.length) { out(i) /= counts(c); i += 1 }
        out
      }
    }.toArray

  /** Distributed Lloyd trainer over the FULL corpus — the 10^9-vector
    * quantizer path. One narrow pass per iteration: each partition folds its
    * rows into LOCAL per-cell (sum, count) accumulators (user-space map-side
    * combine — never a per-row shuffle), and the driver merges the tiny
    * partitions × cells partials (≤ parts · nCells · dim doubles). Seeds are
    * the vectors with the `nCells` smallest `xxhash64(id)` values — a
    * bounded TakeOrdered, stable under any partitioning, and hash-spread so
    * consecutive near-duplicate ids (one crawl source) cannot all seed the
    * same cluster and permanently starve the other cells. The input is
    * persisted for the duration of the iterations (lloydIters + 1 passes
    * over one cached scan instead of re-reading the lineage each time). */
  def trainIvfCentroids(vecs: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      nCells: Int, lloydIters: Int = 5): Array[Array[Double]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cached = vecs.persist()
    try {
      var centroids = cached.orderBy(xxhash64(col("_1")), col("_1"))
        .limit(nCells).collect().map(_._2.clone())
      require(centroids.nonEmpty, "cannot train a quantizer on an empty corpus")
      val dim = centroids.head.length
      (0 until lloydIters).foreach { _ =>
        val bc = spark.sparkContext.broadcast(centroids)
        val partials = cached.mapPartitions { it =>
          val cs = bc.value
          val sums = Array.fill(cs.length)(new Array[Double](dim))
          val counts = new Array[Long](cs.length)
          it.foreach { case (id, v) =>
            if (v.length != dim)
              throw new IllegalArgumentException(
                s"mixed embedding dimensions: id=$id has ${v.length}, expected $dim")
            val c = nearestCentroid(v, cs)
            counts(c) += 1
            var i = 0
            while (i < dim) { sums(c)(i) += v(i); i += 1 }
          }
          Iterator.tabulate(cs.length)(c => (c, sums(c), counts(c))).filter(_._3 > 0)
        }.collect()
        val sums = Array.fill(centroids.length)(new Array[Double](dim))
        val counts = new Array[Long](centroids.length)
        partials.foreach { case (c, s, n) =>
          counts(c) += n
          var i = 0
          while (i < dim) { sums(c)(i) += s(i); i += 1 }
        }
        centroids = updateCentroids(centroids, sums, counts)
        bc.unpersist()
      }
      centroids
    } finally cached.unpersist()
  }

  /** IVF (inverted-file) approximate top-k — the 10^9-vector scale path:
    * k-means coarse quantizer, corpus assigned to nearest centroid (one
    * narrow shuffle-free map), queries probe the `nProbe` nearest cells,
    * exact cosine re-rank inside the probed cells only.
    *
    * Quantizer training: `distributedTrain = true` runs
    * [[trainIvfCentroids]] over the FULL corpus (one pass per Lloyd
    * iteration — the 10^9-vector route where a fixed sample
    * under-represents the distribution); the default trains a seeded Lloyd
    * on a bounded `trainSample` driver-side sample (cheapest when the
    * corpus fits a representative sample). Search path identical either way.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 5,
      trainSample: Int = 2048, distributedTrain: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val vecs = corpus.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val centroids =
      if (distributedTrain) trainIvfCentroids(vecs, nCells, lloydIters)
      else {
        // deterministic training sample: smallest ids (stable under partitioning)
        val sample = vecs.orderBy(col(idCol)).limit(trainSample).collect().map(_._2)
        require(sample.nonEmpty, "cannot train a quantizer on an empty corpus")
        val dim = sample.head.length
        var cs = Array.tabulate(math.min(nCells, sample.length))(i =>
          sample(((i.toLong * 2654435761L) % sample.length).toInt.abs).clone())
        (0 until lloydIters).foreach { _ =>
          val sums = Array.fill(cs.length)(new Array[Double](dim))
          val counts = new Array[Long](cs.length)
          sample.foreach { v =>
            val c = nearestCentroid(v, cs)
            counts(c) += 1
            var i = 0
            while (i < dim) { sums(c)(i) += v(i); i += 1 }
          }
          cs = updateCentroids(cs, sums, counts)
        }
        cs
      }
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    val assigned = vecs.map { case (id, v) =>
      (nearestCentroid(v, bcCentroids.value), id, v)
    }.toDF("cell", "corpus_id", "cv")

    val probed = queries.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        nearestCentroids(v, bcCentroids.value, nProbe).map(c => (c, id, v))
      }.toDF("cell", "query_id", "qv")

    // score map-side, BEFORE any exchange: the broadcast join leaves
    // candidates on the corpus partitions, cosine is computed there, and
    // only (query_id, corpus_id, score) — 24 bytes — rides the dedup and
    // ranking shuffles. Scoring after a distinct over (ids, qv, cv) rows
    // would haul two full vectors per candidate through the exchange, the
    // same payload disease the near-dup verify join had. Each corpus
    // vector lives in exactly ONE cell, so a pair meets at most once and
    // the distinct is a cheap safety net over narrow rows, not a dedup.
    val cand = assigned.join(broadcast(probed), "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
      .select("query_id", "corpus_id", "score").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rank"))
  }

  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int =
    nearestCentroids(v, cs, 1).head

  private def nearestCentroids(v: Array[Double], cs: Array[Array[Double]], n: Int): Seq[Int] =
    cs.indices.map { c =>
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      (c, d)
    }.sortBy(x => (x._2, x._1)).take(n).map(_._1)

  /** LSH-bucketed approximate top-k: candidates must share one of `bands`
    * signature bands with the query, then exact cosine re-rank. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    def withBands(df: DataFrame, id: String, vec: String, out: String) =
      df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol).as(id), col(vecCol).as(vec),
          signBits(col(vecCol), bits).as("sig"))
        .select(col(id), col(vec), posexplode(array(
          (0 until bands).map(b =>
            shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*)))
        .toDF(id, vec, "band", out)
    val c = withBands(corpus, "corpus_id", "cv", "ckey")
    val q = withBands(queries, "query_id", "qv", "qkey")
    // score map-side before the dedup: a pair colliding in several bands
    // scores once per collision (cosine is deterministic, so the duplicate
    // rows are identical and collapse in the distinct), but the exchange
    // carries only (query_id, corpus_id, score) — re-scoring ≤ bands-1
    // extra times costs ~dim multiplies each, far cheaper than shuffling
    // two full vectors per candidate row
    val cand = c.join(broadcast(q),
        col("ckey") === col("qkey") && c("band") === q("band") &&
          col("query_id") =!= col("corpus_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 6))
      .select("query_id", "corpus_id", "score").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rank"))
  }
}
