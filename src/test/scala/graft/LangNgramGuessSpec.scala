package graft

import org.apache.spark.sql.functions.col

import graft.functions.LangNgramGuess
import graft.ops.TextStats

/** Native lang_ngram_guess expression vs the plain-Scala scorer, through SQL
  * (whole-stage codegen path) and with nulls. */
class LangNgramGuessSpec extends SparkSpec {

  test("expression matches the Scala scorer on mixed-language rows") {
    import spark.implicits._
    LangNgramGuess.register(spark)
    val texts = Seq(
      "the weather was nice and the children played in the garden",
      "die kinder spielten im garten und das wetter war schön und warm",
      "les enfants jouaient dans le jardin et le temps était agréable",
      "los niños jugaban en el jardín y el tiempo era muy agradable",
      "这是一个完全由中文字符组成的句子用来测试语言识别",
      "", "42 17 99")
    val got = texts.toDF("t")
      .selectExpr("t", "lang_ngram_guess(t) AS g")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    texts.foreach { t =>
      assert(got(t) === TextStats.langNgramGuess(t), s"text: $t")
    }
  }

  test("null text yields null from the expression; the DataFrame face coalesces to unknown") {
    import spark.implicits._
    LangNgramGuess.register(spark)
    val df = Seq((1L, Some("the quick brown fox and the dog")), (2L, None))
      .toDF("doc_id", "text")
    val raw = df.selectExpr("doc_id", "lang_ngram_guess(text) AS g").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(raw(1L) === "en")
    assert(raw(2L) === null)
    val face = TextStats.withLangNgram(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(face(2L) === "unknown")
  }

  test("the DataFrame face stays inside codegen: no typed-object barrier in the plan") {
    import spark.implicits._
    // a parquet source, not a local Seq: ConvertToLocalRelation would fold
    // the (deterministic) expression away at optimization time entirely
    val dir = java.nio.file.Files.createTempDirectory("graft-lang").toString + "/docs"
    Seq((1L, "hello there")).toDF("doc_id", "text").write.parquet(dir)
    val plan = TextStats.withLangNgram(spark.read.parquet(dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") && !plan.contains("MapPartitions"),
      s"expected no object barrier:\n$plan")
    assert(plan.contains("lang_ngram_guess"), plan)
    // '*(n)' marks a whole-stage-codegen'd operator in the string form;
    // the projection carrying the expression must be inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("lang_ngram_guess") && l.trim.startsWith("*(")), plan)
  }
}
