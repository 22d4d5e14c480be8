package graft

import org.apache.spark.sql.functions._

import graft.encode.CharVocab
import graft.eval.Metrics
import graft.eval.Metrics.EvalSample
import graft.functions.Spans
import graft.pipeline.{ExtractorConfig, ExtractorModel, QaGen}
import graft.schema.{Ontology, Span}
import graft.synth.Corpus

/** QA-sample generation (J7 negatives, O2/O3 sampling) + encoding (T8/T9)
  * + span-level eval e2e through the kernel. */
class QaGenSpec extends SparkSpec {

  private lazy val pages = Corpus.pages(spark, 200, seed = 42, noisyFrac = 0.0).toDF()
  private lazy val gold = Corpus.gold(spark, 200, seed = 42, noisyFrac = 0.0)
  private lazy val qa = QaGen.qaSamples(pages, gold).cache()

  test("sample structure: subjects + positives + bounded negatives") {
    import spark.implicits._
    val goldDf = gold.toDF().cache()
    val nSubjects = goldDf.select("url", "subjectType").distinct().count()
    val nPositives = goldDf.select("url", "subjectType", "relation").distinct().count()

    // O3 oversampling replicates positive samples (subject samples included,
    // as in the reference) → compare distinct
    val subjectSamples = qa.filter(col("subject_token") === "")
    assert(subjectSamples.select("url", "question").distinct().count() === nSubjects)
    assert(subjectSamples.count() >= nSubjects)

    val positives = qa.filter(col("subject_token") =!= "" && size(col("labels")) > 0)
    // positives >= distinct gold relations (oversampling may replicate)
    assert(positives.select("url", "question").distinct().count() === nPositives)

    val negPerDoc = qa.filter(size(col("labels")) === 0)
      .groupBy("url").count().as[(String, Long)].collect()
    assert(negPerDoc.forall(_._2 <= 10))
    assert(negPerDoc.nonEmpty)
  }

  test("labels slice back to the planted surfaces") {
    import spark.implicits._
    val rows = qa.filter(size(col("labels")) > 0)
      .select("url", "context", "question_type", "subject_token", "labels")
      .as[(String, String, Int, String, Seq[Span])].collect()
    assert(rows.nonEmpty)
    val goldByKey = gold.collect()
      .groupBy(g => (g.url, Ontology.questionDic(g.relation)))
    rows.filter(_._4.nonEmpty).foreach { case (url, context, qType, _, labels) =>
      val want = goldByKey((url, qType)).map(_.obj).toSet
      val got = labels.map(sp => context.substring(sp.start, sp.end)).toSet
      assert(got === want, s"$url type=$qType")
    }
  }

  test("single evaluation: the sample subtree appears once in the plan") {
    // r2 verdict hotspot: the counts-join + oversample-branch + union tail
    // re-planned `base` ~3× per action. The window formulation keeps exactly
    // ONE copy of the subtree — asserted via its unique marker nodes: the J7
    // anti-join and the O2 downsample window's md5 ordering each occur once.
    // Fresh inputs (not the suite-cached `qa` frame): the cache manager would
    // otherwise substitute InMemoryRelation and hide the join structure.
    val p2 = Corpus.pages(spark, 60, seed = 7, noisyFrac = 0.0).toDF()
    val g2 = Corpus.gold(spark, 60, seed = 7, noisyFrac = 0.0)
    val plan = QaGen.qaSamples(p2, g2).queryExecution.optimizedPlan
    val antiJoins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antiJoins.size === 1, s"expected 1 anti-join, got ${antiJoins.size}")
    val md5s = plan.toString.sliding(4).count(_ == "md5(")
    assert(md5s === 1, s"expected 1 md5 downsample key, got $md5s")
  }

  test("deterministic: two runs produce identical samples") {
    val a = QaGen.qaSamples(pages, gold).collect().map(_.toString).sorted
    val b = QaGen.qaSamples(pages, gold).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("encode: D1 ∘ T9 round-trip and vocab coverage") {
    import spark.implicits._
    val enc = QaGen.encode(qa).cache()
    val qaRows = qa.select("url", "question_type", "labels")
      .as[(String, Int, Seq[Span])].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet).toMap
    enc.collect().foreach { e =>
      val decoded = Spans.indicesFromLabel(e.labels.drop(1), e.questionType)
      val candidates = qaRows((e.url, e.questionType))
      assert(candidates.exists(spans =>
        decoded.toSet === spans.filter(_.end <= e.lenContext).toSet),
        s"${e.url} type=${e.questionType} decoded=$decoded")
      // no UNK ids: the deterministic vocab covers the corpus charset
      assert(!e.inputIds.take(1 + e.lenContext).exists(_ == CharVocab.UNK))
    }
  }

  test("span-level compute_performance through the kernel: perfect on clean corpus") {
    import spark.implicits._
    val cfg = ExtractorConfig()
    // distributed: qa rows → encode + tag + gold/pred label pair per sample
    val samples = qa
      .select("url", "context", "question", "question_type", "subject_token", "labels")
      .as[(String, String, String, Int, String, Seq[Span])]
      .mapPartitions { it =>
        val (gaz, kernel) = ExtractorModel.get(cfg.kernel)
        it.map { case (_, context, question, qType, token, spans) =>
          val row = graft.encode.Encoder.encode(context, question, cfg.maxSeq)
          val typeName = Ontology.id2relation(qType)
          val bias =
            (if (token.isEmpty) gaz.subjectSpans(context, typeName)
             else gaz.objectSpans(context, token, typeName))
              .filter(_.end <= row.lenContext)
          val pred = kernel.tag(row, bias, qType)
          val bio = Spans.bioLabels(cfg.maxSeq, qType, spans.filter(_.end <= row.lenContext))
          val goldCtx = bio.slice(1, 1 + row.lenContext)
          (qType, EvalSample(qType, goldCtx, pred))
        }
      }
    val perType = Metrics.computePerformance(samples)
    val bad = perType.filter(col("precision_precise") < 1.0 || col("recall_precise") < 1.0)
    assert(bad.count() === 0, bad.collect().mkString("\n"))
    assert(perType.count() > 0)
  }
}
