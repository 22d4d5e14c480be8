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
  *  - `triples/`:  per-batch canonical triples with per-batch url support
  *    (the exactly-once file source delivers each url once, so summing
  *    per-batch counts equals the batch-mode countDistinct)
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
    * a replayed batch must not see its own failed attempt's output. */
  private def readState(spark: SparkSession, path: String, schema: StructType,
      batchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(path).filter(col("batch") < batchId)
      .select(schema.fieldNames.map(col).toSeq: _*)
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

    // candidate edges among the batch's new surfaces, Jaccard-verified
    val nn = newBands.as("a").join(newBands.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        col("a.norm").as("na"), col("b.norm").as("nb"))
      .distinct()
      .as[(Long, Long, String, String)]
      .flatMap { case (s, d, na, nb) =>
        if (jaccardOk(na, nb, shingleN, threshold)) Some((s, d)) else None
      }.toDF("src", "dst")

    // attachments: new surface → existing canonical component (the
    // incremental join this operator exists for — candidates only, via the
    // SAME band keys the batch path uses)
    val ne = newBands.as("a").join(exBands.as("b"), "bucket")
      .select(col("a.id").as("nid"), col("a.norm").as("na"),
        col("b.norm").as("nb"), col("b.canonical_id").as("ex_cid"),
        col("b.canonical_surface").as("ex_rep"))
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

    // this batch's canonical triples under the full (old ∪ new) resolution
    val res = exSurf.select("surface", "canonical_id", "canonical_surface")
      .unionByName(assigned.select("surface", "canonical_id", "canonical_surface"))
    val subjRes = res.select(col("surface").as("subject"),
      col("canonical_id").as("subjectId"), col("canonical_surface").as("subjectCanon"))
    val objRes = res.select(col("surface").as("obj"),
      col("canonical_id").as("objectId"), col("canonical_surface").as("objectCanon"))
    overwrite(triples.toDF()
      .join(subjRes, "subject").join(objRes, "obj")
      .groupBy("subjectId", "subjectCanon", "subjectType", "relation",
        "objectId", "objectCanon", "objectType")
      .agg(countDistinct("url").as("urls"))
      .select(col("subjectId"), col("subjectCanon").as("subject"), col("subjectType"),
        col("relation"), col("objectId"), col("objectCanon").as("obj"),
        col("objectType"), col("urls")), "triples")
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

  /** Aggregated canonical triples across batches (per-batch url support
    * summed — exact under the exactly-once file source). */
  def readCanonicalTriples(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/triples")
      .groupBy("subjectId", "subject", "subjectType", "relation",
        "objectId", "obj", "objectType")
      .agg(sum("urls").as("urls"))

  /** Bridge ledger: components published separately that later batches
    * proved equal — the offline compaction work list. */
  def readBridges(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/bridges").select("kept_id", "bridged_id").distinct()
}
