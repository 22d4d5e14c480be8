package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.link.{ConnectedComponents, Linker}
import graft.ops.Hashing
import graft.schema.Triple

/** Incremental entity linking — the streaming twin of
  * [[Linker.canonicalTriples]]: each micro-batch's NEW mention surfaces are
  * LSH-banded and candidate-joined against the persisted canonical table,
  * verified (true Jaccard), clustered among themselves, and appended to the
  * state — so linking cost per batch is O(batch × candidates), never a
  * re-clustering of the whole corpus.
  *
  * **Stability contract (the documented conflict rule):** a published
  * canonical id is NEVER rewritten. A surface keeps the canonical id and
  * representative it was first assigned, forever. When a batch BRIDGES two
  * existing components (one new-surface cluster verifies against canonical
  * ids A and B, A < B), the new surfaces adopt the minimum id A, existing
  * B-surfaces keep B, and the bridge `(kept=A, bridged=B)` is recorded in
  * the `bridges` state table — the input for an OFFLINE compaction
  * (periodic batch [[Linker.canonicalTriples]] re-run), which owns merging
  * published components. In-stream rewriting would mean a consumer that
  * joined against yesterday's ids silently disagrees with today's table —
  * at 10^12-doc scale that is a correctness bug, not a convenience.
  *
  * State tables under `stateDir`, all partitioned by `batch=<id>` and
  * written with overwrite — a replayed micro-batch (foreachBatch gives
  * at-least-once) overwrites its OWN partition and reads only state from
  * batches strictly before it, so replays are idempotent:
  *  - `surfaces/`: surface → (norm, id, canonical_id, canonical_surface)
  *  - `bands/`:    LSH band key → (id, norm, canonical_id, canonical_surface)
  *  - `bridges/`:  (kept_id, bridged_id)
  *  - `triples/`:  url-grain canonical-triple provenance rows (readers
  *    aggregate countDistinct(url), exact under any delivery guarantee)
  */
object StreamLink {

  private val surfSchema = StructType(Seq(
    StructField("surface", StringType), StructField("norm", StringType),
    StructField("id", LongType), StructField("canonical_id", LongType),
    StructField("canonical_surface", StringType)))
  private val bandSchema = StructType(Seq(
    StructField("bucket", LongType), StructField("id", LongType),
    StructField("norm", StringType), StructField("canonical_id", LongType),
    StructField("canonical_surface", StringType)))

  /** State read for batch `batchId`: only partitions from EARLIER batches —
    * a replayed batch must not see its own failed attempt's output. A state
    * dir that exists but holds no committed parquet footer yet (the very
    * first batch's write died mid-flight, leaving only `_temporary`) reads
    * as empty rather than wedging every replay on a schema-inference error
    * — that crash window is exactly what the replay contract covers. */
  private def readState(spark: SparkSession, path: String, schema: StructType,
      batchId: Long): DataFrame = {
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) empty
    else try spark.read.parquet(path).filter(col("batch") < batchId)
      .select(schema.fieldNames.map(col).toSeq: _*)
    catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  private def jaccardOk(na: String, nb: String, shingleN: Int, threshold: Double): Boolean =
    Hashing.jaccard(Hashing.charShingles(na, shingleN),
      Hashing.charShingles(nb, shingleN)) >= threshold

  /** Link one micro-batch of triples against (and into) the state. Public
    * for direct testing; [[run]] wires it into foreachBatch. */
  def processBatch(batchDf: DataFrame, stateDir: String, batchId: Long,
      shingleN: Int = 2, threshold: Double = 0.6): Unit = {
    val spark = batchDf.sparkSession
    import spark.implicits._
    if (batchDf.isEmpty) return
    val triples = batchDf.select("url", "subjectType", "subject", "relation",
      "objectType", "obj").as[Triple]
    val exSurf = readState(spark, s"$stateDir/surfaces", surfSchema, batchId)
    val exBands = readState(spark, s"$stateDir/bands", bandSchema, batchId)

    val newSurf = Linker.surfaces(triples).toDF()
      .join(exSurf.select("surface"), Seq("surface"), "left_anti")
      .localCheckpoint() // two band fan-outs + the assignment reuse it
    val newBands = newSurf
      .select(col("id"), col("norm"))
      .as[(Long, String)]
      .flatMap { case (id, norm) =>
        Linker.bandKeysOf(norm, shingleN = shingleN).map(b => (b, id, norm))
      }.toDF("bucket", "id", "norm")

    // ---- candidate pairs under the hot-band guard (same discipline as
    // Linker.candidateEdgesLazy): the state side is first semi-joined to
    // the batch's band values (candidates only — the attach cost is
    // O(batch × candidates), never O(state)), then band values whose
    // combined new ∪ candidate-existing membership exceeds `bucketCap`
    // switch from the all-pairs join to bounded sorted-neighborhood
    // pairing over the norm — one templated surface family in the state
    // must not make every later micro-batch quadratic
    val bucketCap = 1000
    val exCand = exBands.join(newBands.select("bucket").distinct(), Seq("bucket"), "left_semi")
    val tagged = newBands
      .select(col("bucket"), col("id"), col("norm"), lit(true).as("is_new"),
        lit(null).cast("long").as("cid"), lit(null).cast("string").as("rep"))
      .unionByName(exCand.select(col("bucket"), col("id"), col("norm"),
        lit(false).as("is_new"), col("canonical_id").as("cid"),
        col("canonical_surface").as("rep")))
    val sizes = tagged.groupBy("bucket").agg(count(lit(1)).as("bn"))
    val sized = tagged.join(sizes, "bucket").persist()
    val small = sized.filter(col("bn") <= bucketCap)
    val big = sized.filter(col("bn") > bucketCap)
    // every emitted pair is anchored on a NEW surface; new-new pairs once
    // (id order), new-existing pairs regardless of id order
    val smallPairs = small.as("a").join(small.as("b"),
        col("a.bucket") === col("b.bucket") &&
          (col("a.id") < col("b.id") || (col("a.is_new") && !col("b.is_new"))))
      .filter(col("a.is_new"))
      .select(col("a.id").as("nid"), col("a.norm").as("na"),
        col("b.id").as("oid"), col("b.norm").as("nb"),
        col("b.is_new").as("other_new"), col("b.cid").as("ex_cid"),
        col("b.rep").as("ex_rep"))
    val bigPairs =
      if (big.isEmpty) smallPairs.limit(0)
      else {
        val meta = tagged.select("id", "norm", "is_new", "cid", "rep").distinct()
        def side(pfx: String) = meta.select(col("id").as(pfx),
          col("norm").as(s"${pfx}_norm"), col("is_new").as(s"${pfx}_new"),
          col("cid").as(s"${pfx}_cid"), col("rep").as(s"${pfx}_rep"))
        val sn = graft.ops.Neighborhood.sortedNeighborhoodPairs(
            big.select(xxhash64(col("bucket")).as("bucket"), col("id"),
              col("norm").as("sort")), 8)
          .select("src", "dst").join(side("src"), "src").join(side("dst"), "dst")
        sn.filter(col("src_new"))
          .select(col("src").as("nid"), col("src_norm").as("na"),
            col("dst").as("oid"), col("dst_norm").as("nb"),
            col("dst_new").as("other_new"), col("dst_cid").as("ex_cid"),
            col("dst_rep").as("ex_rep"))
          .unionByName(sn.filter(col("dst_new") && !col("src_new"))
            .select(col("dst").as("nid"), col("dst_norm").as("na"),
              col("src").as("oid"), col("src_norm").as("nb"),
              lit(false).as("other_new"), col("src_cid").as("ex_cid"),
              col("src_rep").as("ex_rep")))
      }
    val cand = smallPairs.unionByName(bigPairs)

    // Jaccard-verified edges among the batch's new surfaces (direction is
    // irrelevant — ConnectedComponents canonicalizes edges)
    val nn = cand.filter(col("other_new"))
      .select(col("nid").as("src"), col("oid").as("dst"), col("na"), col("nb"))
      .distinct()
      .as[(Long, Long, String, String)]
      .flatMap { case (s, d, na, nb) =>
        if (jaccardOk(na, nb, shingleN, threshold)) Some((s, d)) else None
      }.toDF("src", "dst")

    // verified attachments: new surface → existing canonical component (the
    // incremental join this operator exists for)
    val ne = cand.filter(!col("other_new"))
      .select(col("nid"), col("na"), col("nb"), col("ex_cid"), col("ex_rep"))
      .distinct()
      .as[(Long, String, String, Long, String)]
      .flatMap { case (nid, na, nb, cid, rep) =>
        if (jaccardOk(na, nb, shingleN, threshold)) Some((nid, cid, rep)) else None
      }.toDF("nid", "ex_cid", "ex_rep").distinct()

    val comp = ConnectedComponents.run(nn)
    val withComp = newSurf
      .join(comp.withColumnRenamed("id", "cc_id"), col("id") === col("cc_id"), "left")
      .select(col("surface"), col("norm"), col("id"),
        coalesce(col("component"), col("id")).as("component"))

    // conflict rule: a component adopting ≥2 existing canonical ids takes
    // the MINIMUM; the others are recorded as bridges, never rewritten
    val neComp = ne.join(withComp.select(col("id").as("nid"), col("component")), "nid")
    val adopt = neComp.groupBy("component")
      .agg(min(struct(col("ex_cid").as("c"), col("ex_rep").as("r"))).as("m"))
      .select(col("component"), col("m.c").as("adopt_cid"), col("m.r").as("adopt_rep"))
    val bridges = neComp.select("component", "ex_cid").distinct()
      .join(adopt, "component")
      .filter(col("ex_cid") =!= col("adopt_cid"))
      .select(col("adopt_cid").as("kept_id"), col("ex_cid").as("bridged_id"))
      .distinct()

    // fresh components: representative = min (length, lexicographic), the
    // batch path's rule
    val newReps = withComp.groupBy("component")
      .agg(min(struct(length(col("surface")).as("l"), col("surface").as("s"))).as("r"))
      .select(col("component"), col("r.s").as("new_rep"))
    val assigned = withComp
      .join(adopt, Seq("component"), "left")
      .join(newReps, Seq("component"))
      .select(col("surface"), col("norm"), col("id"),
        coalesce(col("adopt_cid"), col("component")).as("canonical_id"),
        coalesce(col("adopt_rep"), col("new_rep")).as("canonical_surface"))
      .localCheckpoint() // consumed by three writes + the batch resolution

    def overwrite(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").parquet(s"$stateDir/$table/batch=$batchId")
    overwrite(assigned, "surfaces")
    overwrite(assigned.select("id", "norm", "canonical_id", "canonical_surface")
      .as[(Long, String, Long, String)]
      .flatMap { case (id, norm, cid, rep) =>
        Linker.bandKeysOf(norm, shingleN = shingleN).map(b => (b, id, norm, cid, rep))
      }.toDF("bucket", "id", "norm", "canonical_id", "canonical_surface"), "bands")
    overwrite(bridges, "bridges")

    // this batch's canonical (triple, url) provenance rows under the full
    // (old ∪ new) resolution — url-grain, NOT pre-aggregated: summing
    // per-batch counts would double-count a url re-delivered in a later
    // batch (re-crawl appended to the drop dir, a non-file source), so the
    // reader aggregates countDistinct over the provenance instead
    val res = exSurf.select("surface", "canonical_id", "canonical_surface")
      .unionByName(assigned.select("surface", "canonical_id", "canonical_surface"))
    val subjRes = res.select(col("surface").as("subject"),
      col("canonical_id").as("subjectId"), col("canonical_surface").as("subjectCanon"))
    val objRes = res.select(col("surface").as("obj"),
      col("canonical_id").as("objectId"), col("canonical_surface").as("objectCanon"))
    overwrite(triples.toDF()
      .join(subjRes, "subject").join(objRes, "obj")
      .select(col("subjectId"), col("subjectCanon").as("subject"), col("subjectType"),
        col("relation"), col("objectId"), col("objectCanon").as("obj"),
        col("objectType"), col("url"))
      .distinct(), "triples")
    sized.unpersist()
  }

  /** Streaming face: triples stream → per-micro-batch incremental linking. */
  def run(triples: Dataset[Triple], stateDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    triples.toDF().writeStream
      .foreachBatch((df: DataFrame, bid: Long) => processBatch(df, stateDir, bid))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** surface → (canonical_id, canonical_surface), over all committed batches. */
  def readResolution(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/surfaces")
      .select("surface", "canonical_id", "canonical_surface")

  /** Aggregated canonical triples across batches. Support counts are
    * countDistinct over the url-grain provenance rows, so a url
    * re-delivered in a later batch counts ONCE — exact regardless of the
    * source's delivery guarantees. */
  def readCanonicalTriples(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/triples")
      .groupBy("subjectId", "subject", "subjectType", "relation",
        "objectId", "obj", "objectType")
      .agg(countDistinct("url").as("urls"))

  /** Bridge ledger: components published separately that later batches
    * proved equal — the offline compaction work list. */
  def readBridges(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/bridges").select("kept_id", "bridged_id").distinct()
}
