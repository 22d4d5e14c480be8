package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextNorm
import graft.schema.Triple

/** The reference's JSON-lines interchange formats (S2/S5, SURVEY.md §2.1).
  *
  * Gold line shape (README.md:4-12, parsed at data/data_utils.py:240-249):
  * `{"text": …, "spo_list": [{"subject_type": …, "subject": …,
  *   "object_type": {"@value": …}, "object": {"@value": …},
  *   "predicate": …, "Combined": bool}]}`
  *
  * Prediction line shape (run_qa.py:498-508): same, but flat object/
  * object_type strings and key `relation` instead of `predicate`.
  *
  * Schemas are EXPLICIT (never inferred — SURVEY.md S2): at corpus scale an
  * inference pass is a full extra read, and `@value` nesting defeats
  * inference merging anyway.
  */
object GoldIO {

  val goldSchema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("spo_list", ArrayType(StructType(Seq(
      StructField("subject_type", StringType),
      StructField("subject", StringType),
      StructField("object_type", StructType(Seq(StructField("@value", StringType)))),
      StructField("object", StructType(Seq(StructField("@value", StringType)))),
      StructField("predicate", StringType),
      StructField("Combined", BooleanType)
    ))))
  ))

  /** Read reference-format gold JSON-lines → flat normalized triples.
    * Applies the reference's SPO-field normalization (T5: , ( ) → full-width,
    * data/data_utils.py:243-248) to subject/object strings. */
  def readGoldJson(spark: SparkSession, path: String): DataFrame = {
    spark.read.schema(goldSchema).json(path)
      .select(col("text"), explode_outer(col("spo_list")).as("spo"))
      .select(
        col("text"),
        col("spo.subject_type").as("subjectType"),
        TextNorm.normalizeSpoField(col("spo.subject")).as("subject"),
        col("spo.predicate").as("relation"),
        col("spo.object_type.`@value`").as("objectType"),
        TextNorm.normalizeSpoField(col("spo.object.`@value`")).as("obj"),
        coalesce(col("spo.Combined"), lit(false)).as("combined"))
  }

  /** Prediction-compat view: per-document JSON line exactly shaped like the
    * reference sink (run_qa.py:498-508) — nested spo_list per text. Lines
    * are emitted for exactly the docs the predict loop PROCESSES (prepared:
    * lang/keyword/length-filtered, newline-stripped), so gold↔pred files
    * stay line-aligned for the reference's index-paired evaluator. */
  def predictionJson(triples: Dataset[Triple], pages: DataFrame,
      cfg: graft.pipeline.ExtractorConfig = graft.pipeline.ExtractorConfig()): DataFrame = {
    val spo = triples.toDF()
      .groupBy("url")
      .agg(collect_list(struct(
        col("subjectType").as("subject_type"),
        col("subject"),
        col("objectType").as("object_type"),
        col("obj").as("object"),
        col("relation"))).as("spo_list"))
    graft.pipeline.Extract.prepare(pages, cfg)
      .join(spo, Seq("url"), "left")
      .select(col("url"),
        to_json(struct(col("text"),
          coalesce(col("spo_list"),
            array().cast("array<struct<subject_type:string,subject:string," +
              "object_type:string,object:string,relation:string>>")).as("spo_list")))
          .as("json"))
  }

  /** Per-sample eval dump as JSON-lines — the `{sign}_res.json` twin
    * (utils/evaluate_funcs.py:297-309): one line per evaluated sample with
    * answer_gold / answer_pred / question_type + counters. Input is
    * [[graft.eval.Metrics.perSampleEval]] output. */
  def writeResJson(perSample: DataFrame, path: String): Unit =
    perSample.write.mode("overwrite").json(path)

  /** Round-trip writer for the gold format (fixture generation / export). */
  def writeGoldJson(gold: DataFrame, pages: DataFrame, path: String): Unit = {
    val nested = gold
      .groupBy("url")
      .agg(collect_list(struct(
        col("subjectType").as("subject_type"),
        col("subject"),
        struct(col("objectType").as("@value")).as("object_type"),
        struct(col("obj").as("@value")).as("object"),
        col("relation").as("predicate"),
        lit(false).as("Combined"))).as("spo_list"))
    pages.select("url", "text")
      .join(nested, Seq("url"), "inner")
      .select("text", "spo_list")
      .write.mode("overwrite").json(path)
  }
}
