package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.link.ConnectedComponents

/** Deduplication operators for a web-scale training-data pipeline.
  *
  * Scale design notes (100 TB):
  *  - exact dedup is ONE hash-aggregate on a 64-bit fingerprint (partial +
  *    final, map-side combine) — never a sort, never a window over all rows;
  *  - near-dup methods (minhash/LSH, simhash) fan out to (docId, bucketKey)
  *    pairs and self-join on the bucket key, so shuffle volume is
  *    O(docs × bands), not O(docs²); candidate pairs are then verified;
  *  - duplicate CLUSTERS (not just pairs) are resolved with the same
  *    large-star/small-star connected-components used by entity linking, so
  *    keeper selection is transitive-closure-correct.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per fingerprint group.
    * Returns (idCol, keeper, groupSize). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.select(col(idCol), TextStats.fingerprint(col(textCol)).as("fp"))
    val groups = fp.groupBy("fp")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("group_size"))
    fp.join(groups, "fp").select(col(idCol), col("keeper"), col("group_size"))
  }

  /** (docId, shingle) pairs as a DataFrame via native sequence+transform —
    * char n-grams, distinct per doc. */
  def charShingleDF(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), greatest(length(col(textCol)) - n, lit(0))),
          i => substring(col(textCol), i + lit(1), lit(n))))).as("shingle"))
      .filter(length(col("shingle")) > 0)

  /** Pairwise n-gram Jaccard over a shingle self-join (exact, for modest
    * candidate sets / verification): pairs with jaccard >= threshold. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = charShingleDF(df, idCol, textCol, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard", col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash+LSH near-dup clustering: shingle → k minhash lanes → `bands`
    * banded keys → bucket self-join → jaccard-verified edges → connected
    * components. Returns (docId, keeper). */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k % bands == 0)
    val rowsPerBand = k / bands

    val docs = df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
    // minhash signature per doc — computed in one pass, no shuffle
    val sigs = docs.map { case (id, text) =>
      val sh = Hashing.charShingles(text.toLowerCase, shingleN)
      (id, Hashing.minhash(sh, k))
    }.toDF("doc_id", "sig")

    // band keys: hash of each signature slice
    val banded = sigs.select(col("doc_id"), posexplode(array(
      (0 until bands).map(b => xxhash64(concat(lit(s"band$b"),
        slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("string")))): _*)))
      .toDF("doc_id", "band", "bucket")

    val cand = banded.as("a").join(banded.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .distinct()

    // verify candidates with true jaccard (re-shingle both sides); restrict
    // the text table to candidate members first so the full corpus text is
    // shuffled once (semi-join), not twice
    val candIds = cand.select(col("src").as("v_id"))
      .union(cand.select(col("dst").as("v_id"))).distinct()
    val textById = docs.toDF("v_id", "v_text")
      .join(candIds, Seq("v_id"), "left_semi")
    val verified = cand
      .join(textById.withColumnRenamed("v_id", "src").withColumnRenamed("v_text", "text_a"), "src")
      .join(textById.withColumnRenamed("v_id", "dst").withColumnRenamed("v_text", "text_b"), "dst")
      .as[(Long, Long, String, String)]
      .flatMap { case (dst, src, ta, tb) =>
        val j = Hashing.jaccard(
          Hashing.charShingles(ta.toLowerCase, shingleN),
          Hashing.charShingles(tb.toLowerCase, shingleN))
        if (j >= threshold) Some((src, dst)) else None
      }.toDF("src", "dst")

    val comp = ConnectedComponents.run(verified)
    docs.toDF("doc_id", "text").select("doc_id")
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("keeper"))
  }

  /** Embedding-cosine near-dup pairs — exact O(n²) baseline (the scale path
    * is [[graft.ops.Similarity.lshTopK]]-style bucketing). The smaller side
    * is broadcast and the dot products run as tight primitive loops inside
    * mapPartitions: higher-order-function cosine is interpreted per element
    * and ~50× slower at 10^5+ pairs. Double-precision, ascending-index
    * accumulation (matches the SQL oracle's summation order). */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val all = vecs.collect().sortBy(_._1)
    val norms = all.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bcVecs = spark.sparkContext.broadcast(all)
    val bcNorms = spark.sparkContext.broadcast(norms)
    vecs.mapPartitions { it =>
      val ref = bcVecs.value
      val nrm = bcNorms.value
      it.flatMap { case (idA, va) =>
        var sa = 0.0
        var i = 0
        while (i < va.length) { sa += va(i) * va(i); i += 1 }
        val na = math.sqrt(sa)
        ref.iterator.zipWithIndex.collect { case ((idB, vb), j) if idB > idA =>
          var dot = 0.0
          var k = 0
          while (k < va.length) { dot += va(k) * vb(k); k += 1 }
          val c = if (na == 0 || nrm(j) == 0) 0.0 else dot / (na * nrm(j))
          (idA, idB, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.filter(_._3 >= threshold)
      }
    }.toDF("id_a", "id_b", "cosine")
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding-cosine near-dup clustering: verified pairs → connected
    * components → keeper = min id per cluster. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val pairs = embeddingCosinePairs(df, idCol, vecCol, threshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = ConnectedComponents.run(pairs)
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("keeper"))
  }

  /** SimHash near-dup candidates: 64-bit simhash, blocked on 4 16-bit bands
    * (Hamming distance ≤ 3 ⇒ at least one identical band). Returns verified
    * pairs with their Hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, Hashing.simhash(text.toLowerCase.split("\\W+").filter(_.nonEmpty)))
      }.toDF("doc_id", "sim")
    val banded = sigs.select(col("doc_id"), col("sim"), posexplode(array(
      (0 until 4).map(b => shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("doc_id", "sim", "band", "key")
    banded.as("a").join(banded.as("b"),
        col("a.key") === col("b.key") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
