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
    * @return DataFrame(id: Long, component: Long) — component = min node id
    *         reachable; covers every node appearing in `edges`.
    */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession

    def canon(df: DataFrame): DataFrame = df
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()

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

    var cur = canon(edges).localCheckpoint()
    var converged = false
    var it = 0
    var lastSum: Option[(Long, Long)] = None
    while (!converged && it < maxIter) {
      // lazy checkpoint: the signature aggregation below materializes it,
      // so each round costs ONE job instead of checkpoint-then-aggregate
      val next = canon(smallStar(largeStar(cur))).localCheckpoint(false)
      val sig = next.agg(
        count(lit(1)).cast("long"),
        coalesce(sum(hash(col("src"), col("dst")).cast("long")), lit(0L))
      ).head()
      val curSig = (sig.getLong(0), sig.getLong(1))
      converged = lastSum.contains(curSig)
      lastSum = Some(curSig)
      cur = next
      it += 1
    }

    // converged: every edge is (node -> root of its component)
    val mapping = cur.groupBy("src").agg(min("dst").as("component"))
      .select(col("src").as("id"), col("component"))
    val roots = mapping.select(col("component").as("id"), col("component")).distinct()
    mapping.union(roots).groupBy("id").agg(min("component").as("component"))
  }
}
