package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.encode.Encoder
import graft.functions.Spans
import graft.pipeline.{ExtractorConfig, ExtractorModel, QaGen}
import graft.schema.{EncodedSample, GoldTriple, Ontology, Span}

/** End-to-end span-level evaluation — the reference's predict-on-dev loop
  * (run_qa.py --do_predict → utils/evaluate_funcs.py compute_performance):
  * QA samples are encoded (T8), the kernel predicts context tags per row,
  * and gold/pred tag arrays feed [[Metrics.computePerformance]] /
  * [[Metrics.perSampleEval]].
  *
  * One shuffle-free mapPartitions (encode + forward + Viterbi per row, model
  * as the per-JVM singleton) — the eval twin of the extraction barrier.
  */
object EvalRun {

  /** (askedType, EvalSample) per QA sample. Gold tags use the reference's
    * convention (0 = background, B = type id, I = id+1, index 0 = context
    * char 0); pred tags come from the kernel's Viterbi decode over the same
    * encoded row. Spans truncated away by maxSeq are excluded from gold,
    * mirroring the reference's feature builder. */
  /** @param questionFirst the default-off `question_first=True` variant
    *        (utils/evaluate_funcs.py:433-436): rows encode `[CLS] question
    *        [SEP] context [SEP]` and the pred tags come from the reference's
    *        quirky slice over the CLS-stripped decode — one past the true
    *        context start (see [[graft.model.Kernel.tagBatch]]). Gold labels
    *        stay the exact context slice, as the reference's label slice
    *        `[2 + lenQ, 2 + lenQ + lenCtx)` over the UNstripped array is. */
  def evalSamples(pages: DataFrame, gold: Dataset[GoldTriple],
      cfg: ExtractorConfig = ExtractorConfig(),
      questionFirst: Boolean = false): Dataset[(Int, Metrics.EvalSample)] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // maxSeq flows from cfg so the F1 length gate and the encoder always
    // truncate at the SAME bound — a split value silently skews alignment
    QaGen.qaSamples(pages, gold, maxSeq = cfg.maxSeq)
      .select("url", "context", "question", "question_type", "subject_token", "labels")
      .as[(String, String, String, Int, String, Seq[Span])]
      .mapPartitions { rows =>
        val (gaz, kernel) = ExtractorModel.get(cfg.kernel)
        // grouped(32): the reference's DataLoader(batch_size=32) forward
        // shape (run_qa.py:167-171) — one packed matmul batch per chunk,
        // bit-identical to row-at-a-time (Kernel.tagBatch contract)
        rows.grouped(graft.pipeline.Extract.kernelBatchSize).flatMap { chunk =>
          val reqs = chunk.map { case (_, context, question, qType, subjTok, _) =>
            val row =
              if (questionFirst) Encoder.encodeQuestionFirst(context, question, cfg.maxSeq)
              else Encoder.encode(context, question, cfg.maxSeq)
            val name = Ontology.id2relation(qType)
            // subject vs relation sample is decided by subject_token: subject
            // samples carry "" (QaGen.subjectSamples). The tag id CANNOT
            // discriminate — e.g. Pleura is both a subject type and a relation
            // with the SAME id, and its relation samples must take the
            // objectSpans branch exactly as Extract's turn 2 does.
            val bias =
              (if (subjTok.isEmpty) gaz.subjectSpans(context, name)
               else gaz.objectSpans(context, subjTok, name))
                .filter(_.end <= row.lenContext)
            (row, bias, qType)
          }.toArray
          val preds = kernel.tagBatch(reqs, questionFirst)
          chunk.zipWithIndex.map { case ((_, _, _, qType, _, spans), i) =>
            val lenContext = reqs(i)._1.lenContext
            val goldSpans = spans.filter(_.end <= lenContext)
            val goldBio = Spans.bioLabels(lenContext + 1, qType, goldSpans).drop(1)
            (qType, Metrics.EvalSample(qType, goldBio, preds(i)))
          }
        }
      }
  }

  /** Per-type metrics table for a (pages, gold) corpus — the `{sign}_res`
    * aggregate of the reference, end to end. */
  def perTypeMetrics(pages: DataFrame, gold: Dataset[GoldTriple],
      cfg: ExtractorConfig = ExtractorConfig(),
      questionFirst: Boolean = false): DataFrame =
    Metrics.computePerformance(evalSamples(pages, gold, cfg, questionFirst))

  /** Eval over a PERSISTED encoded_samples stage
    * ([[graft.pipeline.Pipeline.runEncode]]) — the production S4 path:
    * features are read back, never re-encoded; only the kernel forward runs
    * here. Metrics are identical to [[evalSamples]] by construction — the
    * stored BIO labels slice to the same gold tags the direct path builds
    * (both filter spans at lenContext), and the gazetteer bias re-derives
    * from the stored line-aligned context/subjectToken. */
  def evalSamplesFromStage(spark: SparkSession, path: String,
      cfg: ExtractorConfig = ExtractorConfig()): Dataset[(Int, Metrics.EvalSample)] = {
    import spark.implicits._
    graft.io.TableIO.readStage(spark, path)
      .select("url", "questionType", "inputIds", "inputMask", "segmentIds",
        "labels", "lenQuestion", "lenContext", "context", "subjectToken")
      .as[EncodedSample]
      .mapPartitions { rows =>
        val (gaz, kernel) = ExtractorModel.get(cfg.kernel)
        rows.grouped(graft.pipeline.Extract.kernelBatchSize).flatMap { chunk =>
          val reqs = chunk.map { e =>
            val row = graft.encode.EncodedRow(e.inputIds, e.inputMask,
              e.segmentIds, e.lenQuestion, e.lenContext)
            val name = Ontology.id2relation(e.questionType)
            val bias =
              (if (e.subjectToken.isEmpty) gaz.subjectSpans(e.context, name)
               else gaz.objectSpans(e.context, e.subjectToken, name))
                .filter(_.end <= e.lenContext)
            (row, bias, e.questionType)
          }.toArray
          val preds = kernel.tagBatch(reqs)
          chunk.zipWithIndex.map { case (e, i) =>
            val goldBio = e.labels.slice(1, 1 + e.lenContext)
            (e.questionType, Metrics.EvalSample(e.questionType, goldBio, preds(i)))
          }
        }
      }
  }

  /** Per-type metrics over a persisted encoded stage. */
  def perTypeMetricsFromStage(spark: SparkSession, path: String,
      cfg: ExtractorConfig = ExtractorConfig()): DataFrame =
    Metrics.computePerformance(evalSamplesFromStage(spark, path, cfg))
}
