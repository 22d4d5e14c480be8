package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextStats}
import graft.pipeline.Extract
import graft.schema.Ontology
import graft.synth.Corpus

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), each with a DuckDB-equivalent `oracleSql` where the op is
  * SQL-expressible. Column names and value rounding are aligned on both
  * sides (the driver hash-compares after sorting columns by name).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** One scratch root per JVM for stage-table queries: fresh on a new
    * process (no stale-stage adoption across binaries), resumable within it,
    * and DELETED on JVM exit so repeated bench/driver runs don't accumulate
    * stage directories in tmp. */
  private lazy val processScratchRoot: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stage_").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(dir): Unit))
    dir.getAbsolutePath
  }

  /** Flagship: the two-turn KG extraction pipeline over the deterministic
    * synthetic page corpus (FIXTURES.md) — driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Extract.triples(Corpus.pages(spark, 600, seed = 42, noisyFrac = 0.02).toDF()).toDF()

  // 4-row turn-1 question dim (J1) and 16-row (subject_type, relation) dim (J2)
  private def subjectDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Ontology.subject2question.keys.toSeq.toDF("subject_type")
  }
  private def relationDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Ontology.questionTurn.toSeq
      .flatMap { case (st, rels) => rels.map(r => (st, r)) }
      .toDF("subject_type", "relation")
  }
  /** Synthetic per-epoch dev-F1 histories (4 runs × 25 epochs, deterministic
    * from orders) — shared by both a5 queries so their constants cannot
    * silently diverge. Their oracle CTEs mirror this derivation verbatim. */
  private def a5Hist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(pmod(col("o_custkey"), lit(4)).as("run_id"),
        (pmod(col("o_orderkey"), lit(25)) + 1).as("epoch"))
      .agg((pmod(sum(col("o_orderkey")), lit(1000)) / 1000.0).as("dev_f1"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------------- scans/aggs
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),
    "q3_order_revenue" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_nationkey") < 10)
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),
    "q5_nation_revenue" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(round(sum("o_totalprice"), 2).as("rev"), count(lit(1)).as("cnt"))
    }),
    // Q9-shaped margin rollup — completes source coverage (part, supplier,
    // region were previously unread): two fact-side shuffle joins AQE can
    // re-plan, two broadcast dims, a pushdown-eligible part filter
    "q9_supplier_margin" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_size") <= 20),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") =!= "MIDDLE EAST")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            - col("l_quantity") * col("p_retailprice") * 0.5), 2).as("margin"),
          count(lit(1)).as("cnt"))),
    // ---------------------------------------------------------------- filters
    "f1_length_gate" -> ((s, dir) =>
      t(s, dir, "documents").filter(length(col("text")) < 300)
        .select("doc_id", "n_chars")),
    "f2_keyword_exclusion" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(length(col("text")) > 0 &&
          !col("text").contains("vector") && !col("text").contains("stream"))
        .select("doc_id")),
    // ---------------------------------------------------------------- strings
    "t1_clean_chain" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(
          col("text"), "[(]", "（"), ",", "，"), "[#*\\s]{2,}", "-").as("cleaned"))),
    "t2_translate" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        translate(col("text"), "aeiou", "12345").as("tr"))),
    "t6_t7_locate_slice" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        (locate("table", col("text")) - 1).as("pos"),
        substring(col("text"), 3, 8).as("slice"))),
    // ---------------------------------------------------------------- joins/fanouts
    "j1_question_expansion" -> ((s, dir) =>
      t(s, dir, "documents").select("doc_id").crossJoin(broadcast(subjectDim(s)))),
    "j2_relation_fanout" -> ((s, dir) => {
      val typed = t(s, dir, "documents").select(col("doc_id"),
        element_at(
          array(lit("Mass"), lit("Lymph"), lit("Pleura"), lit("Effusion")),
          (col("doc_id") % 4).cast("int") + 1).as("subject_type"))
      typed.join(broadcast(relationDim(s)), "subject_type")
        .select("doc_id", "subject_type", "relation")
    }),
    "j3_distinct_dedup" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()),
    "j5_semi_join" -> ((s, dir) => {
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      t(s, dir, "orders")
        .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey")
    }),
    "j7_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")),
    // co-located join over Spark BUCKETED tables (both sides pre-bucketed
    // by the join key → zero exchange; plan asserted in TableIOSpec). The
    // layout write is a ONE-TIME cost amortized over repeated joins — table
    // names are keyed by the source dir and reused across calls in a
    // process, and the bench battery reports the per-query MIN over its
    // repeats, so the reported number measures the join, not the first
    // pass's layout write
    "bucketed_colocated_join" -> ((s, dir) => {
      val tag = (dir.hashCode.toLong & 0x7FFFFFFFL).toString
      val (custT, ordT) = (s"g_cust_b_$tag", s"g_ord_b_$tag")
      if (!s.catalog.tableExists(custT))
        graft.io.TableIO.writeBucketedTable(
          t(s, dir, "customer").select("c_custkey", "c_acctbal"), custT, "c_custkey", 8)
      if (!s.catalog.tableExists(ordT))
        graft.io.TableIO.writeBucketedTable(
          t(s, dir, "orders").select("o_custkey", "o_totalprice"), ordT, "o_custkey", 8)
      s.table(custT)
        .join(s.table(ordT), col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("cnt"))
    }),
    "j6_all_match_flag" -> ((s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(min(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("all_f"))),
    // ---------------------------------------------------------------- aggs/metrics
    "a1_metric_counters" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          round(sum("value"), 2).as("sum_value"),
          countDistinct("user_id").as("num_users"))),
    "a2_pr_arithmetic" -> ((s, dir) => {
      val base = t(s, dir, "events").groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("value") > 0.5, 1L).otherwise(0L)).as("tp"))
      base.select(col("event_type"), col("cnt"), col("tp"),
        when(col("cnt") =!= 0, round(col("tp").cast("double") / col("cnt"), 4))
          .otherwise(lit(0.0)).as("precision"))
    }),
    "o7_mod_split" -> ((s, dir) =>
      t(s, dir, "documents").groupBy((col("doc_id") % 5).as("bucket"))
        .agg(count(lit(1)).as("n"))),
    "a3_macro_average" -> ((s, dir) => {
      val perType = t(s, dir, "events").groupBy("event_type")
        .agg(avg("value").as("avg_value"))
      perType.agg(round(avg("avg_value"), 4).as("macro_avg"), count(lit(1)).as("n_types"))
    }),
    "a4_doc_exact_precision" -> ((s, dir) => {
      val flags = t(s, dir, "orders").groupBy("o_custkey")
        .agg(min(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("all_f"))
      flags.agg(round(avg("all_f"), 4).as("doc_exact_precision"))
    }),
    // A5/O5 — the training loop's early-stop bookkeeping (run_qa.py:285-306)
    // as a run-partitioned window operator: epoch histories derived
    // deterministically from orders (4 runs x 25 epochs), strict-improvement
    // patience counter, break after counter > 5; only executed epochs emit
    "a5_early_stop" -> ((s, dir) =>
      graft.eval.TrainLoop.earlyStop(a5Hist(s, dir), patience = 5)),
    // A5 companion — which checkpoint the final test pass would load per run
    // (the LAST improving epoch; null when a run never beats the init 0,
    // run_qa.py:294-299/327-337)
    "a5_best_checkpoint" -> ((s, dir) =>
      graft.eval.TrainLoop.bestCheckpoint(a5Hist(s, dir), patience = 5)),
    // ---------------------------------------------------------------- sampling
    "o2_deterministic_downsample" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(md5(col("event_id").cast("string")), col("event_id"))
      t(s, dir, "events").withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("user_id", "event_id")
    }),
    "o3_oversample" -> ((s, dir) =>
      t(s, dir, "events").filter(col("value") > 0.9)
        .select(col("event_id"), explode(sequence(lit(1), lit(3))).as("copy"))),
    // ---------------------------------------------------------------- json
    "s3_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))),
    // ---------------------------------------------------------------- windows
    "w1_first_event_per_user" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
    }),
    "w2_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev", lag(unix_timestamp(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || unix_timestamp(col("ts")) - col("prev") > 1800, 1L)
            .otherwise(0L))
        .groupBy("user_id").agg(sum("new_sess").as("sessions"))
    }),
    // the Sessionize OPERATOR itself (sorted-partition fold / stateful-state
    // twin), oracle-checked against a SQL session segmentation at exact
    // millisecond precision (both sides truncate micros -> ms)
    "w3_sessionize_operator" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Sessionize
      val ev = t(s, dir, "events").select(
        col("user_id").cast("long").as("userId"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type").as("eventType")).as[Sessionize.Event]
      Sessionize.sessions(ev, gapMs = 1800000L).toDF()
        .select(col("userId").as("user_id"),
          unix_millis(col("start")).as("start_ms"),
          unix_millis(col("end")).as("end_ms"),
          col("events"))
    }),
    // ---------------------------------------------------------------- text analysis
    "text_token_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("tokens"),
        round(TextStats.meanWordLen(col("text")), 4).as("mean_word_len"))),
    "text_lang_guess" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"), TextStats.langGuess(col("text")).as("guess"))
        .agg(count(lit(1)).as("n"))),
    "text_quality_score" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.qualityScore(col("text")).as("quality"))),
    "text_subword_count" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextStats.subwordCount(col("text")).cast("long").as("subwords"))),
    "text_stopword_ratio" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        round(TextStats.stopwordRatio(col("text")), 4).as("stopword_ratio"))),
    // TF-IDF characteristic terms (smoothed sklearn idf, deterministic
    // term-tiebroken rank) — restricted to doc_id < 100 to keep the oracle's
    // unnest tractable; the operator itself runs corpus-wide in the pipeline
    "text_tfidf_topk" -> ((s, dir) =>
      TextStats.tfidfTopK(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text", k = 5)),
    // ---------------------------------------------------------------- sampling (corpus curation)
    // deterministic hash-Bernoulli rebalance by language: en 0.25, de 0.5,
    // es 0.75, zh 1.0, fr unlisted → dropped. Map-side filter, zero shuffles.
    "sample_stratified" -> ((s, dir) =>
      graft.ops.Sampling.hashStratified(
        t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.25, "de" -> 0.5, "es" -> 0.75, "zh" -> 1.0), salt = "graft")
        .select("doc_id", "lang", "source")),
    // the flagship CURATION COMPOSITION — the ops chained the way a real
    // 100 TB training-data pass runs them: quality gate → script gate →
    // stratified rebalance → exact dedup (keepers only) → TF-IDF tagging.
    // One declarative plan end-to-end; every stage oracle-mirrored.
    "curation_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val gated = docs
        .filter(TextStats.qualityScore(col("text")) >= 0.5)
        .filter(TextStats.langGuess(col("text")) === "latin")
      val sampled = graft.ops.Sampling.hashStratified(
        gated, "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0), salt = "graft")
      // keeper selection via exactKeepers' single window (not exact's
      // agg+self-join, which planned the gated scan 4×). Two gated-scan
      // executions remain — tfidf's lazy corpus-count branch plus the main
      // branch (whose tf exchange AQE reuses) — pinned by PlanSpec's
      // runtime-scan-count assertion; the QaGen r2 lesson applied forward
      TextStats.tfidfTopK(Dedup.exactKeepers(sampled, "doc_id", "text"),
        "doc_id", "text", k = 3)
    }),
    // ---------------------------------------------------------------- dedup
    "dedup_exact_groups" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(lower(regexp_replace(col("text"), "\\s+", " ")).as("norm"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("group_size"))),
    // the Dedup.exact OPERATOR itself (keeper/group assignment per doc —
    // hash-independent semantics, so fully oracle-checkable)
    "dedup_exact_keeper" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text",
        n = 8, threshold = 0.1)),
    "dedup_embedding_cosine" -> ((s, dir) =>
      Dedup.embeddingCosinePairs(
        t(s, dir, "embeddings").filter(col("vec_id") < 1000), "vec_id", "embedding", 0.45)),
    // forces the LSH-bucketed scale path (localThreshold=0): never collects
    // the corpus to the driver — rows-only (hash-seeded banding)
    "emb_near_dup_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.45, localThreshold = 0L)),
    // ---------------------------------------------------------------- skew
    "skew_salted_agg" -> ((s, dir) =>
      graft.ops.Skew.saltedCountSum(t(s, dir, "events"), "event_type", "value", "event_id")
        .select(col("event_type"), col("cnt"), round(col("sum_value"), 2).as("sum_value"))),
    // ---------------------------------------------------------------- graph
    "cc_chain_components" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val edges = ids.filter(col("doc_id") % 10 < 9)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      graft.link.ConnectedComponents.run(edges)
    }),
    // ---------------------------------------------------------------- similarity
    "ann_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .withColumn("score", round(col("score"), 4))
    }),
    // -------------------------------------------------- non-SQL-expressible (rows-only)
    // n-gram-profile language ID (Cavnar-Trenkle scoring; deterministic
    // embedded profiles) — per-guess counts over the corpus
    "text_lang_ngram" -> ((s, dir) =>
      TextStats.withLangNgram(t(s, dir, "documents"), "doc_id", "text")
        .groupBy("lang_guess").agg(count(lit(1)).as("n"))),
    "lsh_minhash_dedup" -> ((s, dir) =>
      Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 8, k = 16, bands = 4, threshold = 0.2)),
    // winnowed rolling-hash fingerprints (Schleimer et al. SIGMOD'03):
    // partial-overlap pairs — rows-only (splitmix-finalized hashes)
    "winnow_overlap_pairs" -> ((s, dir) =>
      Dedup.winnowedOverlapPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 16, w = 8, minShared = 3)),
    // maxHamming=3: the standard simhash near-dup radius (Manku et al.,
    // WWW'07) — combinatorial blocking keeps pigeonhole recall at the
    // requested radius at every solved geometry for all buckets under the
    // hot-bucket cap (the cap's bounded fallback is the one documented
    // recall trade, counted per run by SimhashStats); the radius is the
    // cost knob and the block count scales with corpus size
    "simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)),
    "lsh_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
    }),
    "ivf_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
    }),
    // WARC/WET first-mile ingestion (rows-only: parses a deterministic
    // seeded .wet fixture written at query time — no DuckDB twin for the
    // lineSep record split)
    "warc_wet_ingest" -> ((s, dir) => {
      // fixture under the shutdown-cleaned process scratch; the (n, seed)-
      // keyed writer returns an existing file untouched, so repeat
      // invocations in one JVM genuinely reuse it and nothing leaks in /tmp
      val tmp = s"$processScratchRoot/wetq"
      graft.sources.WarcIngest.writeWetFixture(tmp, n = 600, seed = 29)
      graft.sources.WarcIngest.readWet(s, tmp)
        .select(col("url"), col("warc_ts"), length(col("text")).as("text_len"), col("lang"))
    }),
    // byte-level WARC reader (rows-only): an adversarial fixture — ISO-8859-1
    // HTML payload, a two-member .warc.gz, and a WET body quoting the record
    // delimiter — framed byte-exactly by recordsBytes; the text-scan twin
    // would transcode or drop each of them
    "warc_bytes_ingest" -> ((s, dir) => {
      val tmp = s"$processScratchRoot/warcbytes"
      val marker = java.nio.file.Paths.get(tmp, "fixture.done")
      if (!java.nio.file.Files.exists(marker)) {
        import graft.sources.WarcIngest.{gzipMember, rawRecordBytes}
        val lang = (tag: String) => Seq("WARC-Identified-Content-Language" -> tag)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
        val iso = "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII") ++
          "<html>café über straße</html>".getBytes("ISO-8859-1")
        java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "mixed.warc"),
          rawRecordBytes("response", "https://bytes.test/iso", iso) ++
            rawRecordBytes("conversion", "https://bytes.test/delim",
              "body quoting the WARC/1.0 delimiter token".getBytes("UTF-8"), lang("eng")))
        java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "two.warc.gz"),
          gzipMember(rawRecordBytes("response", "https://bytes.test/gz1",
            "HTTP/1.1 200 OK\r\n\r\n<p>one</p>".getBytes("UTF-8"))) ++
            gzipMember(rawRecordBytes("conversion", "https://bytes.test/gz2",
              "second member text".getBytes("UTF-8"), lang("deu"))))
        java.nio.file.Files.write(marker, Array.emptyByteArray)
      }
      val html = graft.sources.WarcIngest.readWarcHtml(s, tmp)
        .select(col("url"), xxhash64(col("html")).as("payload_hash"),
          length(col("html")).as("payload_bytes"))
      val text = graft.sources.WarcIngest.readWetBytes(s, tmp)
        .select(col("url"), xxhash64(col("text")).as("payload_hash"),
          length(col("text")).cast("int").as("payload_bytes"))
      html.unionByName(text).orderBy("url")
    }),
    // incremental entity linking (rows-only): the batch face of
    // graft.streaming.StreamLink driven for two micro-batches — the second
    // bridges two published components; output = the full resolution plus
    // the bridge ledger, so id stability AND the conflict rule are
    // driver-checked every round
    "link_incremental" -> ((s, dir) => {
      import s.implicits._
      val work = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(processScratchRoot), "linkinc").toString
      val docs = Corpus.pages(s, 120, seed = 42, noisyFrac = 0.0).toDF()
      // checkpoint BEFORE splitting (the link_compaction discipline): the
      // url filter cannot push below the opaque kernel barrier, so without
      // it each batch's processBatch checkpoint re-runs the full extraction
      val triples = Extract.triples(docs).toDF().localCheckpoint()
      val batch1 = triples.filter(xxhash64(col("url")) % 2 === 0)
      val batch2 = triples.filter(xxhash64(col("url")) % 2 =!= 0)
      graft.streaming.StreamLink.processBatch(batch1, work, batchId = 0)
      graft.streaming.StreamLink.processBatch(batch2, work, batchId = 1)
      val res = graft.streaming.StreamLink.readResolution(s, work)
        .select(col("surface"), col("canonical_id"), col("canonical_surface"),
          lit(null).cast("long").as("bridged_id"))
      val bridges = graft.streaming.StreamLink.readBridges(s, work)
        .select(lit("__bridge__").as("surface"), col("kept_id").as("canonical_id"),
          lit(null).cast("string").as("canonical_surface"), col("bridged_id"))
      res.unionByName(bridges).orderBy("surface", "canonical_id")
    }),
    // offline bridge compaction (rows-only): three incremental batches into
    // a state dir, then graft.link.Compaction — output = the migration map
    // (old → new ids + new representative + changed flag), driver-checked
    // for determinism every round; the equality-to-batch-linker proof is
    // LinkCompactionSpec's job
    "link_compaction" -> ((s, dir) => {
      val work = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(processScratchRoot), "linkcomp").toString
      val triples = Extract.triples(
        Corpus.pages(s, 120, seed = 42, noisyFrac = 0.0).toDF()).toDF()
        .localCheckpoint()
      // pmod, not %: xxhash64 is signed and Spark's % keeps the dividend's
      // sign, so `% 3 === i` over i in 0..2 would silently drop every row
      // with a negative hash and nonzero remainder (~1/3 of the corpus)
      for (i <- 0 until 3)
        graft.streaming.StreamLink.processBatch(
          triples.filter(pmod(xxhash64(col("url")), lit(3)) === i), work, batchId = i)
      graft.link.Compaction.compact(s, work, s"$work/compacted")
        .orderBy("old_id")
    }),
    "mm_media_meta" -> ((s, dir) =>
      graft.multimodal.Media.metaTable(graft.multimodal.Media.corpus(s, 400, seed = 3))),
    "mm_frame_sample" -> ((s, dir) =>
      graft.multimodal.Media.sampleFrames(graft.multimodal.Media.corpus(s, 300, seed = 3)).toDF()
        .select(col("url"), col("frameIdx"))),
    "mm_feature_ann" -> ((s, dir) => {
      val feats = graft.multimodal.Media.features(
        graft.multimodal.Media.corpus(s, 300, seed = 3)).toDF()
        .withColumn("vec_id", xxhash64(col("url")))
      Similarity.bruteForceTopK(feats,
        feats.filter(col("url") < "media://3/0000000005"), "vec_id", "feature", k = 5)
    }),
    "kg_extract_triples" -> ((s, dir) =>
      Extract.triples(Corpus.pages(s, 400, seed = 42, noisyFrac = 0.0).toDF()).toDF()),
    "kg_qa_samples" -> ((s, dir) => {
      val pages = Corpus.pages(s, 300, seed = 42, noisyFrac = 0.0).toDF()
      val gold = Corpus.gold(s, 300, seed = 42, noisyFrac = 0.0)
      // rows-only contract: project the labels array to sortable scalars
      // (the driver's comparator sorts every column; arrays aren't hashable)
      graft.pipeline.QaGen.qaSamples(pages, gold)
        .select(col("url"), col("question_type"), col("subject_token"),
          size(col("labels")).as("n_labels"), to_json(col("labels")).as("labels_json"))
    }),
    "kg_encoded_samples" -> ((s, dir) => {
      val pages = Corpus.pages(s, 300, seed = 42, noisyFrac = 0.0).toDF()
      val gold = Corpus.gold(s, 300, seed = 42, noisyFrac = 0.0)
      graft.pipeline.QaGen.encode(graft.pipeline.QaGen.qaSamples(pages, gold)).toDF()
        .select(col("url"), col("questionType"), col("lenQuestion"), col("lenContext"))
    }),
    "kg_link_entities" -> ((s, dir) => {
      val triples = Extract.triples(Corpus.pages(s, 300, seed = 42, noisyFrac = 0.0).toDF())
      graft.link.Linker.canonicalTriples(triples).toDF()
    }),
    // the north-star composition, driver-checked every round: WET archive →
    // byte-framed ingest → two-turn extraction → LSH linking + CC
    // canonicalization → bucket-partitioned graph materialize with
    // per-partition lineage manifests. Returns the per-stage manifest
    // summary (rows + xor-of-bucket-checksums — deterministic), so a hash
    // drift anywhere in the five-stage chain flips this query. Fresh work
    // dir per invocation: each run is the FULL pipeline, never a resume
    // no-op (resume semantics are PipelineE2ESpec's job).
    "kg_e2e_pipeline" -> ((s, dir) => {
      val wetDir = s"$processScratchRoot/e2e_wet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(wetDir, "e2e.wet"))) {
        val recs = (0L until 250L).map { i =>
          val d = Corpus.buildDoc(i, seed = 23, noisyFrac = 0.0)
          (d.page.url, "zho", d.page.text)
        }
        graft.sources.WarcIngest.writeWetRecords(wetDir, "e2e.wet", recs)
      }
      val work = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(processScratchRoot), "e2e_run").toString
      val pages = graft.sources.WarcIngest.readWet(s, wetDir)
      val cfg = graft.pipeline.Pipeline.Config(work, nBuckets = 16,
        inputSnapshot = "wet-e2e-v1", completeInput = true)
      graft.pipeline.Pipeline.run(pages, cfg)
      import s.implicits._
      Seq(("extract", graft.pipeline.Pipeline.triplesDir(cfg)),
        ("canonicalize", graft.pipeline.Pipeline.canonicalDir(cfg)))
        .map { case (st, p) =>
          val snap = graft.io.TableIO.readSnapshot(s, p).get
          (st, snap.buckets.size, snap.buckets.map(_.rowCount).sum,
            snap.buckets.map(_.checksum).foldLeft(0L)(_ ^ _))
        }.toDF("stage", "buckets", "rows", "checksum")
    }),
    "kg_byte_identity" -> ((s, dir) => {
      // input_hint invariant: text == extractText(html) per url, checked with
      // native Column expressions over the html binary (zero UDFs)
      val pages = Corpus.pages(s, 500, seed = 42, noisyFrac = 0.05).toDF()
      pages.select(
        count(lit(1)).as("docs"),
        sum(when(graft.functions.TextNorm.extractText(col("html")) =!= col("text"), 1L)
          .otherwise(0L)).as("mismatches"))
    }),
    "kg_metrics_per_type" -> ((s, dir) => {
      // the reference's compute_performance end-to-end: encode -> kernel ->
      // Viterbi -> per-type precise/blurred P/R/F1 (rows-only: kernel op)
      val pages = Corpus.pages(s, 300, seed = 42, noisyFrac = 0.0).toDF()
      val gold = Corpus.gold(s, 300, seed = 42, noisyFrac = 0.0)
      graft.eval.EvalRun.perTypeMetrics(pages, gold)
        .select(col("question_type"), col("tp_precise"), col("tp_blurred"),
          col("num_pre"), col("num_gold"), col("match_count"),
          round(col("precision_precise"), 4).as("precision_precise"),
          round(col("recall_precise"), 4).as("recall_precise"),
          round(col("f1_blurred"), 4).as("f1_blurred"))
    }),
    "kg_per_sample_eval" -> ((s, dir) => {
      // the reference's res_lst per-sample dump (answer_gold/answer_pred)
      val pages = Corpus.pages(s, 200, seed = 42, noisyFrac = 0.0).toDF()
      val gold = Corpus.gold(s, 200, seed = 42, noisyFrac = 0.0)
      graft.eval.Metrics.perSampleEval(graft.eval.EvalRun.evalSamples(pages, gold))
    }),
    "kg_encode_stage" -> ((s, dir) => {
      import graft.pipeline.Pipeline
      // the production S4 path end-to-end, driver-checked: persist the
      // encoded_samples stage (bucket-grain, resumable), then eval FROM the
      // persisted features. The workDir is per-process and shutdown-cleaned
      // (fresh JVM → fresh stage; battery repeats within a process hit the
      // no-op resume, so the min-of-N number measures stage-read eval, not
      // the one-time encode)
      val work = s"$processScratchRoot/encstage_${dir.hashCode.toLong & 0x7FFFFFFFL}"
      val cfg = Pipeline.Config(workDir = work, nBuckets = 8,
        inputSnapshot = "pages-v1", completeInput = true)
      val pages = Corpus.pages(s, 200, seed = 42, noisyFrac = 0.0).toDF()
      val gold = Corpus.gold(s, 200, seed = 42, noisyFrac = 0.0)
      Pipeline.runEncode(pages, gold, cfg)
      graft.eval.EvalRun.perTypeMetricsFromStage(s, Pipeline.encodedDir(cfg))
        .select(col("question_type"), col("tp_precise"), col("num_pre"),
          col("num_gold"), round(col("f1_precise"), 4).as("f1_precise"))
    }),
    "kg_macro_scores" -> ((s, dir) => {
      import s.implicits._
      import graft.eval.{EvalRun, Metrics}
      // A3 end-to-end: macro P/R/F1 averaged over ALL 17 ontology types —
      // zero-sample types contribute 0, as the reference iterates the full
      // performance_dic key set (utils/evaluate_funcs.py:311-317) — plus
      // acc = matched spans / samples (rows-only: kernel op)
      val pages = Corpus.pages(s, 200, seed = 42, noisyFrac = 0.0).toDF()
      val gold = Corpus.gold(s, 200, seed = 42, noisyFrac = 0.0)
      // cache + count, NOT an Observation riding the collect: measured
      // r7 (4-pass min, same window) — observe() read 3.19 s vs 2.59 s for
      // this form; the CollectMetrics node costs more than the extra
      // cached-count action saves at this scale
      val samples = EvalRun.evalSamples(pages, gold).cache()
      val n = samples.count()
      val m = Metrics.macroScores(Metrics.computePerformance(samples), n)(s)
      samples.unpersist()
      Seq((m("precision"), m("recall"), m("f1"), Metrics.round4(m("acc"))))
        .toDF("macro_precision", "macro_recall", "macro_f1", "acc")
    }),
    "kg_eval_pr" -> ((s, dir) => {
      import s.implicits._
      import graft.eval.Metrics
      // the north-rule quality gate, materialized: triple-set P/R/F1 + the
      // reference's doc-exact precision on the noisy split; cached so the
      // kernel extraction runs once across the four metric actions
      val pages = Corpus.pages(s, 800, seed = 43, noisyFrac = 0.08).toDF().cache()
      val gold = Corpus.gold(s, 800, seed = 43, noisyFrac = 0.08).cache()
      val pred = Extract.triples(pages).cache()
      val (p, r, f1) = Metrics.tripleSetPR(pred, gold)
      val docExact = Metrics.docExactPrecision(pred, gold, pages.select("url"))
      val out = Seq((Metrics.round4(p), Metrics.round4(r), Metrics.round4(f1),
        Metrics.round4(docExact), p >= 0.95 && r >= 0.95 && docExact >= 0.95))
        .toDF("precision", "recall", "f1", "doc_exact_precision", "gate_passed")
      pages.unpersist(); gold.unpersist(); pred.unpersist()
      out
    })
  )

  /** DuckDB twins. Omitted keys (lsh_*, simhash_*, kg_*) are non-SQL-
    * expressible (hash-seeded or mapPartitions-kernel ops) → rows-only. */
  // ------------------------------------------------------------------
  // Shared oracle SQL fragments — the expressions that appear in more than
  // one oracle live HERE once, so the parity surface (Spark op ↔ DuckDB
  // twin) can only change in a single place. Plain concatenation, not
  // s-interpolation: these bodies carry regex backslashes that the s
  // interpolator would reject as invalid escapes.
  // ------------------------------------------------------------------

  /** The a5 early-stop ledger's CTE chain (shared by both a5 oracles — the
    * patience arithmetic must change in ONE place): synthetic histories,
    * floored strict-improvement flag, running best, counter, stop cutoff,
    * and the `executed` epochs. Mirrors [[graft.eval.TrainLoop.earlyStop]]
    * incl. the best-init-0 floor on every comparison. */
  private val a5LedgerSql: String =
    """WITH hist AS (
         SELECT o_custkey % 4 AS run_id, o_orderkey % 25 + 1 AS epoch,
                (sum(o_orderkey) % 1000) / 1000.0 AS dev_f1
         FROM orders GROUP BY 1, 2),
       scored AS (
         SELECT run_id, epoch, dev_f1,
                row_number() OVER (PARTITION BY run_id ORDER BY epoch) AS rn,
                CASE WHEN dev_f1 > greatest(coalesce(max(dev_f1) OVER (
                       PARTITION BY run_id ORDER BY epoch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0), 0.0)
                     THEN 1 ELSE 0 END AS improved
         FROM hist),
       counted AS (
         SELECT run_id, epoch, dev_f1, rn, improved,
                greatest(max(dev_f1) OVER (
                  PARTITION BY run_id ORDER BY epoch), 0.0) AS best_f1,
                CAST(rn - coalesce(max(CASE WHEN improved = 1 THEN rn END) OVER (
                  PARTITION BY run_id ORDER BY epoch), 0) AS INTEGER) AS torrence_std
         FROM scored),
       stopped AS (
         SELECT *, min(CASE WHEN torrence_std > 5 THEN rn END) OVER (
                     PARTITION BY run_id) AS stop_rn
         FROM counted),
       executed AS (
         SELECT * FROM stopped
         WHERE rn <= coalesce(stop_rn, 9223372036854775807))"""

  /** TextStats.qualityScore's DuckDB twin (expression over `text`). */
  private val qualityExprSql: String =
    """round(greatest(0.0,
       least(length(text)/500.0, 1.0)
       * (CASE WHEN (CASE WHEN length(trim(text))=0 THEN 0.0
            ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                 / length(string_split_regex(trim(text), '\s+')) END)
            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.4 END)
       * (1.0 - least((CASE WHEN length(text)=0 THEN 0.0
            ELSE CAST(length(text) - length(regexp_replace(text,'[.!?,;:。，！？；：]','','g')) AS DOUBLE)
                 / length(text) END) * 4.0, 1.0) * 0.5)), 4)"""

  /** TextStats.langGuess's DuckDB twin (expression over `text`). */
  private val langGuessExprSql: String =
    """CASE WHEN length(text)=0 THEN 'unknown'
       WHEN CAST(length(text) - length(regexp_replace(text,'[^\x00-\x7F]','','g')) AS DOUBLE)
            / length(text) > 0.3 THEN 'cjk'
       ELSE 'latin' END"""

  /** TextStats.fingerprint's normalization twin (exact-dedup group key). */
  private val normTextExprSql: String =
    """lower(regexp_replace(coalesce(text,''), '\s+', ' ', 'g'))"""

  /** TextStats.tfidfTopK's DuckDB twin: CTE tail over a preceding CTE named
    * `corpus` providing (doc_id, text). */
  private def tfidfTailSql(k: Int): String =
    """,
       raw AS (
         SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
         FROM corpus),
       toks AS (SELECT doc_id, term FROM raw WHERE length(term) > 0),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n FROM corpus),
       scored AS (
         SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 4) AS tfidf
         FROM tf JOIN dfreq USING (term) CROSS JOIN n),
       ranked AS (
         SELECT *, CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
         FROM scored)
       SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= """ + k

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),2) AS avg_qty,
         CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_order_revenue" ->
      """SELECT o_orderkey,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         JOIN customer ON o_custkey=c_custkey
         WHERE c_nationkey < 10 AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY o_orderkey""",
    "q5_nation_revenue" ->
      """SELECT n_name, round(sum(o_totalprice),2) AS rev,
         CAST(count(*) AS BIGINT) AS cnt
         FROM customer JOIN nation ON c_nationkey=n_nationkey
         JOIN orders ON o_custkey=c_custkey
         GROUP BY n_name""",
    "q9_supplier_margin" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)
           - l_quantity * p_retailprice * 0.5), 2) AS margin,
         CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_size <= 20
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey AND r_name <> 'MIDDLE EAST'
         GROUP BY 1, 2""",
    "f1_length_gate" ->
      "SELECT doc_id, n_chars FROM documents WHERE length(text) < 300",
    "f2_keyword_exclusion" ->
      """SELECT doc_id FROM documents WHERE length(text) > 0
         AND text NOT LIKE '%vector%' AND text NOT LIKE '%stream%'""",
    "t1_clean_chain" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         text, '[(]', '（', 'g'), ',', '，', 'g'), '[#*\s]{2,}', '-', 'g') AS cleaned
         FROM documents""",
    "t2_translate" ->
      "SELECT doc_id, translate(text, 'aeiou', '12345') AS tr FROM documents",
    "t6_t7_locate_slice" ->
      """SELECT doc_id, CAST(strpos(text, 'table') - 1 AS INT) AS pos,
         substring(text, 3, 8) AS slice FROM documents""",
    "j1_question_expansion" ->
      """SELECT doc_id, subject_type FROM documents
         CROSS JOIN (VALUES ('Mass'),('Lymph'),('Pleura'),('Effusion')) q(subject_type)""",
    "j2_relation_fanout" -> {
      val dimRows = Ontology.questionTurn.toSeq
        .flatMap { case (st, rels) => rels.map(r => s"('$st','$r')") }.mkString(",")
      s"""SELECT doc_id, subject_type, relation FROM (
          SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'Mass' WHEN 1 THEN 'Lymph'
            WHEN 2 THEN 'Pleura' ELSE 'Effusion' END AS subject_type
          FROM documents) d
          JOIN (VALUES $dimRows) r(subject_type, relation) USING (subject_type)"""
    },
    "j3_distinct_dedup" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "j5_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders WHERE EXISTS
         (SELECT 1 FROM customer WHERE c_custkey=o_custkey AND c_acctbal > 9000)""",
    "j7_anti_join" ->
      """SELECT c_custkey FROM customer WHERE NOT EXISTS
         (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""",
    "j6_all_match_flag" ->
      """SELECT o_custkey, CAST(min(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS all_f
         FROM orders GROUP BY o_custkey""",
    "bucketed_colocated_join" ->
      """SELECT c_custkey, round(sum(o_totalprice), 2) AS total,
         CAST(count(*) AS BIGINT) AS cnt
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "a1_metric_counters" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
         round(sum(value),2) AS sum_value,
         CAST(count(DISTINCT user_id) AS BIGINT) AS num_users
         FROM events GROUP BY event_type""",
    "a2_pr_arithmetic" ->
      """SELECT event_type, cnt, tp,
         CASE WHEN cnt <> 0 THEN round(CAST(tp AS DOUBLE)/cnt, 4) ELSE 0.0 END AS precision
         FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp
               FROM events GROUP BY event_type)""",
    "o7_mod_split" ->
      """SELECT doc_id % 5 AS bucket, CAST(count(*) AS BIGINT) AS n
         FROM documents GROUP BY 1""",
    "a3_macro_average" ->
      """SELECT round(avg(avg_value), 4) AS macro_avg, CAST(count(*) AS BIGINT) AS n_types
         FROM (SELECT event_type, avg(value) AS avg_value FROM events GROUP BY 1)""",
    "a4_doc_exact_precision" ->
      """SELECT round(avg(all_f), 4) AS doc_exact_precision FROM (
         SELECT o_custkey, min(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS all_f
         FROM orders GROUP BY 1)""",
    "a5_early_stop" ->
      (a5LedgerSql +
        """
         SELECT run_id, epoch, dev_f1, best_f1, torrence_std,
                CAST(improved AS INTEGER) AS improved
         FROM executed"""),
    "a5_best_checkpoint" ->
      (a5LedgerSql +
        """
         SELECT run_id,
                max(CASE WHEN improved = 1 THEN epoch END) AS best_epoch,
                max(best_f1) AS best_f1,
                CAST(count(*) AS INTEGER) AS epochs_run
         FROM executed GROUP BY run_id"""),
    "o2_deterministic_downsample" ->
      """SELECT user_id, event_id FROM (
         SELECT user_id, event_id, row_number() OVER (
           PARTITION BY user_id ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
         FROM events) WHERE rn <= 3""",
    "o3_oversample" ->
      """SELECT event_id, CAST(c.copy AS INT) AS copy FROM events
         CROSS JOIN (VALUES (1),(2),(3)) c(copy) WHERE value > 0.9""",
    "s3_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
         FROM events""",
    "w1_first_event_per_user" ->
      """SELECT user_id, event_id, event_type FROM (
         SELECT user_id, event_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events) WHERE rn = 1""",
    "w2_sessionize" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS sessions FROM (
         SELECT user_id, CASE WHEN prev IS NULL
             OR date_part('epoch', ts) - prev > 1800 THEN 1 ELSE 0 END AS new_sess
         FROM (SELECT user_id, ts,
               lag(date_part('epoch', ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events)) GROUP BY user_id""",
    "w3_sessionize_operator" ->
      """WITH base AS (
           SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         x AS (SELECT user_id, event_id, ts, ms,
                 CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS new_sess
               FROM base),
         s AS (SELECT user_id, ms,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
               FROM x)
         SELECT user_id, min(ms) AS start_ms, max(ms) AS end_ms,
                CAST(count(*) AS BIGINT) AS events
         FROM s GROUP BY user_id, sid""",
    "text_token_stats" ->
      """SELECT doc_id,
         CASE WHEN length(trim(text))=0 THEN 0
              ELSE CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS tokens,
         CASE WHEN length(trim(text))=0 THEN 0.0
              ELSE round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                   / length(string_split_regex(trim(text), '\s+')), 4) END AS mean_word_len
         FROM documents""",
    "text_lang_guess" ->
      ("""SELECT lang, (""" + langGuessExprSql + """) AS guess,
         CAST(count(*) AS BIGINT) AS n
         FROM documents GROUP BY 1, 2"""),
    "text_stopword_ratio" -> {
      val sw = graft.ops.TextStats.stopwords.map(w => s"'$w'").mkString(",")
      s"""SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0.0
               ELSE round(CAST(length(list_filter(
                      string_split_regex(lower(trim(text)), '\\s+'),
                      w -> w IN ($sw))) AS DOUBLE)
                    / length(string_split_regex(trim(text), '\\s+')), 4) END
            AS stopword_ratio
          FROM documents"""
    },
    "text_tfidf_topk" ->
      ("""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100)""" +
        tfidfTailSql(5)),
    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE md5(CAST(doc_id AS VARCHAR) || ':graft') <
           CASE lang WHEN 'en' THEN '40000000000000000000000000000000'
                     WHEN 'de' THEN '80000000000000000000000000000000'
                     WHEN 'es' THEN 'c0000000000000000000000000000000'
                     WHEN 'zh' THEN 'g' END""",
    "curation_pipeline" ->
      ("""WITH sampled AS (
           SELECT doc_id, text FROM documents
           WHERE (""" + qualityExprSql + """) >= 0.5
             AND (""" + langGuessExprSql + """) = 'latin'
             AND md5(CAST(doc_id AS VARCHAR) || ':graft') <
               CASE lang WHEN 'en' THEN '80000000000000000000000000000000'
                         WHEN 'de' THEN 'g' WHEN 'es' THEN 'g' WHEN 'fr' THEN 'g' END),
         keepers AS (
           SELECT min(doc_id) AS doc_id FROM sampled
           GROUP BY """ + normTextExprSql + """),
         corpus AS (
           SELECT s.doc_id, s.text FROM sampled s JOIN keepers k ON s.doc_id = k.doc_id)""" +
        tfidfTailSql(3)),
    // Spark's lookaround split has no RE2 twin; equivalent closed form:
    // pieces = (# alnum runs) + (# non-alnum chars)
    "text_subword_count" ->
      """SELECT doc_id,
         CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+'))
            + length(text)
            - length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) AS subwords
         FROM documents""",
    "text_quality_score" ->
      ("""SELECT doc_id, """ + qualityExprSql + """ AS quality FROM documents"""),
    "dedup_exact_groups" ->
      """SELECT lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm,
         min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS group_size
         FROM documents GROUP BY 1""",
    "dedup_exact_keeper" ->
      ("""WITH f AS (
           SELECT doc_id, """ + normTextExprSql + """ AS norm
           FROM documents WHERE doc_id IS NOT NULL),
         g AS (
           SELECT norm, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS group_size
           FROM f GROUP BY 1)
         SELECT f.doc_id, g.keeper, g.group_size FROM f JOIN g USING (norm)"""),
    "dedup_ngram_jaccard" ->
      """WITH raw AS (
           SELECT doc_id, unnest(list_transform(
             range(1, greatest(length(text) - 7, 1) + 1),
             i -> substring(text, CAST(i AS INT), 8))) AS shingle
           FROM documents WHERE doc_id < 200),
         sh AS (SELECT DISTINCT doc_id, shingle FROM raw WHERE length(shingle) > 0),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         shared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(CAST(shared AS DOUBLE) / (na.n_sh + nb.n_sh - shared), 4) AS jaccard
         FROM shared
         JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(shared AS DOUBLE) / (na.n_sh + nb.n_sh - shared) >= 0.1""",
    "dedup_embedding_cosine" ->
      """WITH v AS (
           SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM (
             SELECT vec_id, unnest(embedding) AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings WHERE vec_id < 1000)),
         n AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1),
         d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x*b.x) AS dot
               FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
               GROUP BY 1, 2)
         SELECT id_a, id_b, round(round(dot/(na.nrm*nb.nrm), 6), 4) AS cosine
         FROM d JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
         WHERE round(dot/(na.nrm*nb.nrm), 6) >= 0.45""",
    "skew_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
         round(sum(value), 2) AS sum_value
         FROM events GROUP BY event_type""",
    "cc_chain_components" ->
      """WITH nodes AS (
           SELECT doc_id FROM documents WHERE doc_id % 10 < 9
           UNION SELECT doc_id + 1 FROM documents WHERE doc_id % 10 < 9)
         SELECT CAST(doc_id AS BIGINT) AS id,
                CAST(doc_id - doc_id % 10 AS BIGINT) AS component
         FROM nodes""",
    "ann_cosine_topk" ->
      """WITH v AS (
           SELECT vec_id, CAST(x AS DOUBLE) AS x, i FROM (
             SELECT vec_id, unnest(embedding) AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings)),
         n AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM v GROUP BY 1),
         d AS (SELECT a.vec_id AS q, b.vec_id AS c, sum(a.x*b.x) AS dot
               FROM v a JOIN v b ON a.i = b.i
               WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id
               GROUP BY 1, 2),
         s AS (SELECT q AS query_id, c AS corpus_id,
                      round(dot / (na.nrm * nb.nrm), 6) AS score
               FROM d JOIN n na ON na.vec_id = d.q JOIN n nb ON nb.vec_id = d.c)
         SELECT query_id, corpus_id, round(score, 4) AS score, rank FROM (
           SELECT query_id, corpus_id, score,
                  CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, corpus_id) AS INT) AS rank
           FROM s) WHERE rank <= 5"""
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
