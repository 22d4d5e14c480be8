package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge DataFrame with alternating
  * large-star / small-star joins (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") — pure DataFrame ops, no GraphX/RDD (north_rule),
  * converges in O(log n) rounds even on long chains.
  *
  * Scale notes: every round is two hash-aggregations + a join on node id;
  * `localCheckpoint` truncates lineage each round so plans don't grow;
  * AQE handles post-shuffle coalescing and skewed hot components are
  * bounded because large-star flattens high-degree stars first.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two numeric columns (src, dst)
    * @param localThreshold canonical-edge count at or below which the
    *        component computation runs as a driver-side union-find (a few MB
    *        of ids) instead of iterative distributed joins — the same
    *        size-based strategy switch AQE applies to joins; each
    *        distributed round costs several shuffles, pure overhead on
    *        small graphs
    * @return DataFrame(id: Long, component: Long) — component = min node id
    *         reachable; covers every node appearing in a non-self-loop edge
    *         (pure self-loop nodes carry no linkage — callers left-join and
    *         coalesce to self).
    */
  def run(edges: DataFrame, maxIter: Int = 25, localThreshold: Long = 500000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    def canon(df: DataFrame): DataFrame = df
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()

    // checkpoint FIRST, then count the checkpointed frame: the input plan is
    // evaluated exactly once inside the operator no matter what the caller
    // did upstream (the size probe and the first iteration both read the
    // materialized edges, not the original — possibly kernel-bearing — plan)
    val canonical = canon(edges).localCheckpoint()

    // size probe and edge fetch in ONE action: a bounded take off the
    // checkpointed edges decides the strategy (es is only read when small,
    // and the limit caps driver memory at localThreshold+1 rows)
    val es = if (localThreshold > 0)
      canonical.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
        .as[(Long, Long)].collect()
    else Array.empty[(Long, Long)]
    if (localThreshold > 0 && es.length <= localThreshold) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
      return nodes.toSeq.map(v => (v, find(v))).toDF("id", "component")
    }

    // large-star: for every u, attach its LARGER neighbors to
    // min(Γ(u) ∪ {u}); small-star: attach the smaller-or-equal ones.
    def neighbors(e: DataFrame): DataFrame =
      e.select(col("src").as("u"), col("dst").as("v"))
        .union(e.select(col("dst").as("u"), col("src").as("v")))

    def largeStar(e: DataFrame): DataFrame = {
      val nb = neighbors(e)
      val mins = nb.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      nb.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .union(mins.select(col("u").as("src"), col("m").as("dst")))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val nb = neighbors(e).filter(col("v") <= col("u"))
      val mins = nb.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      nb.join(mins, "u")
        .select(col("v").as("src"), col("m").as("dst"))
        .union(mins.select(col("u").as("src"), col("m").as("dst")))
    }

    var cur = canonical
    var converged = false
    var it = 0
    var lastSig: Option[(Long, Long, Long)] = None
    while (!converged && it < maxIter) {
      // lazy checkpoint: the signature aggregation below materializes it,
      // so each round costs ONE job instead of checkpoint-then-aggregate.
      // Signature = (count, hash-sum, independent xxhash-xor): two mixing
      // lanes over the edge set make a coincidental fixed-point collision
      // (which would terminate a round early) ~2^-128-improbable.
      val next = canon(smallStar(largeStar(cur))).localCheckpoint(false)
      val sig = next.agg(
        count(lit(1)).cast("long"),
        coalesce(sum(hash(col("src"), col("dst")).cast("long")), lit(0L)),
        coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L))
      ).head()
      val curSig = (sig.getLong(0), sig.getLong(1), sig.getLong(2))
      converged = lastSig.contains(curSig)
      lastSig = Some(curSig)
      cur = next
      it += 1
    }
    // silently returning components from a NON-star edge set would split
    // entities across canonical ids with no signal — fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not reach a fixed point in $maxIter rounds " +
          s"(last signature $lastSig) — raise maxIter")

    // converged: every edge is (node -> root of its component)
    val mapping = cur.groupBy("src").agg(min("dst").as("component"))
      .select(col("src").as("id"), col("component"))
    val roots = mapping.select(col("component").as("id"), col("component")).distinct()
    mapping.union(roots).groupBy("id").agg(min("component").as("component"))
  }
}
