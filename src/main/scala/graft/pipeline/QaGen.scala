package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.encode.Encoder
import graft.functions.Spans
import graft.schema.{EncodedSample, GoldTriple, Ontology, Span}

/** Offline QA-sample preparation — the relational re-formulation of
  * `parse_triple_to_qa_directly` + `convert_to_input_feature`
  * (data/data_utils.py:230-338, 478-566; traced in SURVEY.md §3.1).
  *
  * One linear DataFrame pipeline replaces the reference's in-memory python
  * loops: gold triples join pages → subject samples + positive relation
  * samples + anti-join negatives (J7) → deterministic negative downsampling
  * (O2: md5-ordered window instead of np.random.choice — seedable and
  * reproducible, documented divergence) → positive oversampling (O3, the
  * reference's `min(neg,10)/len(pos)/2` integer rate) → char-pair encoding
  * (T8) + BIO label arrays (T9) in one mapPartitions.
  */
object QaGen {

  /** qa_samples table (FIXTURES.md §3):
    * (url, context, question, question_type, subject_token, labels). */
  def qaSamples(pages: DataFrame, gold: Dataset[GoldTriple],
      numNegSample: Int = 10, maxSeq: Int = 168): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._

    // F1 — the reference's training-path length gate: contexts at or above
    // max_seq - 20 chars are SKIPPED entirely, not truncated
    // (data/data_utils.py:491); gold for gated-out docs is dropped with them
    val ctx = pages.filter(length(col("text")) < maxSeq - 20)
      .select(col("url"), col("text").as("context"))
    // ONE url-keyed exchange feeds every downstream clustering: hash(url)
    // satisfies the grouped aggregations on (url, subjectType[, relation]),
    // the negative anti-join, and both url-partitioned windows (partitioning
    // expressions ⊆ clustering keys), so none of them re-shuffles — without
    // this the plan carried four key-specific exchanges over the gold rows
    val g = gold.toDF().join(ctx.select("url"), Seq("url"), "left_semi")
      .repartition(col("url"))

    // subject type -> question / tag id dims (broadcast closure constants)
    val subjQ = Ontology.subject2question.map { case (t, q) =>
      (t, q, Ontology.questionDic(t))
    }.toSeq.toDF("subjectType", "question", "question_type")
    val relDim = Ontology.questionTurn.toSeq
      .flatMap { case (st, rels) => rels.map(r => (st, r)) }
      .toDF("subjectType", "relation")
    val relQ = Ontology.relation2question.map { case (r, q) =>
      (r, q, Ontology.questionDic(r))
    }.toSeq.toDF("relation", "rel_question", "rel_question_type")

    // one subject per (url, type): the reference's per-type slot is
    // overwritten per spo, so the LAST-planted subject wins — max_by(start)
    val subjects = g.groupBy("url", "subjectType")
      .agg(max_by(col("subject"), col("spanSubject.start")).as("subject"),
        max_by(col("spanSubject"), col("spanSubject.start")).as("span"))

    val subjectSamples = subjects
      .join(broadcast(subjQ), "subjectType")
      .select(col("url"), col("question"), col("question_type"),
        lit("").as("subject_token"), array(col("span")).as("labels"))

    // positive relation samples: distinct object spans per (url, type, rel);
    // subject_token = the LAST-planted subject of the type (max_by on span
    // start), the same deterministic slot subjectSamples and negatives use —
    // first() would be partitioning-dependent
    val positives = g.groupBy("url", "subjectType", "relation")
      .agg(max_by(col("subject"), col("spanSubject.start")).as("subject_token"),
        array_sort(array_distinct(collect_list(col("spanObject")))).as("labels"))

    // J7 negatives: allowed relations never planted for this subject
    val negatives = subjects
      .join(broadcast(relDim), "subjectType")
      .join(positives.select("url", "subjectType", "relation"),
        Seq("url", "subjectType", "relation"), "left_anti")
      .select(col("url"), col("subjectType"), col("relation"),
        col("subject").as("subject_token"),
        array().cast("array<struct<start:int,end:int>>").as("labels"))

    // O2: deterministic per-doc negative downsample
    val w = Window.partitionBy("url")
      .orderBy(md5(concat(col("url"), col("subjectType"), col("relation"))))
    val sampledNegatives = negatives
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= numNegSample)
      .drop("rn")

    val relationSamples = positives
      .select(col("url"), col("subjectType"), col("relation"),
        col("subject_token"), col("labels"))
      .unionByName(sampledNegatives)
      .join(broadcast(relQ), "relation")
      .select(col("url"),
        concat(col("subject_token"), col("rel_question")).as("question"),
        col("rel_question_type").as("question_type"),
        col("subject_token"), col("labels"))

    val base = subjectSamples.unionByName(
      relationSamples.drop("subjectType"))

    // O3: positive oversampling rate = min(neg,10)/len(pos)/2, computed per
    // doc (the reference accumulates its counters incrementally inside the
    // per-subject loop; the per-doc formulation is the order-independent
    // equivalent suitable for a distributed plan). len(pos) counts EVERY
    // positive sample — the turn-1 subject entries included, exactly as the
    // reference's pos_samples list is built (data_utils.py:285-289,333-336).
    //
    // Plan shape: ONE pass over `base`. The per-doc counters are window
    // aggregates over url (no orderBy → whole-partition frame), and each row
    // explodes to 1 + rate copies (positives under oversampling) or exactly
    // 1 copy — so the subject/positive/negative subtree above is planned and
    // evaluated ONCE per action. The previous counts-join + oversample-branch
    // + union formulation re-evaluated `base` (two groupBys, an anti-join, a
    // window, two unions) ~3× per action — a constant-factor tax on every
    // feature-prep and eval query at any scale.
    val wUrl = Window.partitionBy("url")
    val isPos = size(col("labels")) > 0
    base
      .withColumn("n_pos", sum(when(isPos, 1).otherwise(0)).over(wUrl))
      .withColumn("n_neg", sum(when(isPos, 0).otherwise(1)).over(wUrl))
      .withColumn("rate",
        when(col("n_pos") > 0,
          floor(least(col("n_neg"), lit(numNegSample)) / col("n_pos") / 2))
          .otherwise(lit(0)))
      .withColumn("_copies",
        when(isPos && col("rate") > 0, col("rate").cast("int") + 1).otherwise(lit(1)))
      .select(col("url"), col("question"), col("question_type"),
        col("subject_token"), col("labels"),
        explode(sequence(lit(1), col("_copies"))).as("_copy"))
      .drop("_copy")
      .join(ctx, "url")
      .select("url", "context", "question", "question_type", "subject_token", "labels")
  }

  /** encoded_samples: the columnar twin of the reference's six .npy
    * matrices, built in one mapPartitions (T8 encode + T9 BIO labels);
    * carries the line-aligned context/subject_token so a persisted stage is
    * self-sufficient for eval (see [[graft.eval.EvalRun.evalSamplesFromStage]]). */
  def encode(qa: DataFrame, maxSeq: Int = 168): Dataset[EncodedSample] = {
    val spark = qa.sparkSession
    import spark.implicits._
    qa.select("url", "context", "question", "question_type", "subject_token", "labels")
      .as[(String, String, String, Int, String, Seq[Span])]
      .mapPartitions(_.map { case (url, context, question, qType, subjTok, spans) =>
        val row = Encoder.encode(context, question, maxSeq)
        val bio = Spans.bioLabels(maxSeq, qType, spans.filter(_.end <= row.lenContext))
        EncodedSample(url, qType, row.inputIds, row.inputMask, row.segmentIds,
          bio, row.lenQuestion, row.lenContext, context, subjTok)
      })
  }
}
