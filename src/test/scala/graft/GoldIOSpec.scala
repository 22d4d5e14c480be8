package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.GoldIO
import graft.pipeline.Extract
import graft.synth.Corpus

/** Reference JSON interchange: explicit-schema gold reader, prediction-compat
  * writer, and a full write→read round-trip. */
class GoldIOSpec extends SparkSpec {

  test("per-sample res JSON dump round-trips (the {sign}_res.json twin)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-res").toString + "/res"
    val gold = Array(0, 0, 8, 9, 0, 0)
    val perSample = graft.eval.Metrics.perSampleEval(spark.createDataset(Seq(
      (8, graft.eval.Metrics.EvalSample(8, gold, gold)))))
    GoldIO.writeResJson(perSample, dir)
    val back = spark.read.json(dir)
    assert(back.count() === 1)
    val r = back.head()
    assert(r.getAs[String]("question_type") === "Size")
    assert(r.getAs[String]("answer_gold") === "2:4")
    assert(r.getAs[Long]("tp_precise") === 1L)
  }

  test("gold JSON round-trips through the reference format") {
    val dir = Files.createTempDirectory("graft-gold").toString + "/gold"
    val pages = Corpus.pages(spark, 150, seed = 42, noisyFrac = 0.0).toDF()
    val gold = Corpus.gold(spark, 150, seed = 42, noisyFrac = 0.0).toDF()

    GoldIO.writeGoldJson(gold, pages, dir)
    val back = GoldIO.readGoldJson(spark, dir)

    // every (text-keyed) triple survives byte-identically; T5 normalization
    // is a no-op on lexicon phrases (clean-invariant by LexiconSpec)
    val wantByText = gold
      .join(pages.select("url", "text"), "url")
      .select("text", "subjectType", "subject", "relation", "objectType", "obj")
      .collect().map(_.toSeq).toSet
    val gotSet = back
      .select("text", "subjectType", "subject", "relation", "objectType", "obj")
      .collect().map(_.toSeq).toSet
    assert(gotSet === wantByText)
    assert(back.where(col("combined")).count() === 0)
  }

  test("T5 normalization applies to SPO fields on read") {
    val dir = Files.createTempDirectory("graft-gold2").toString
    val line = """{"text":"x","spo_list":[{"subject_type":"Mass","subject":"a(b),c",""" +
      """"object_type":{"@value":"Size"},"object":{"@value":"(d)"},""" +
      """"predicate":"Size","Combined":true}]}"""
    Files.writeString(java.nio.file.Paths.get(dir, "g.json"), line)
    val row = GoldIO.readGoldJson(spark, dir).head()
    assert(row.getAs[String]("subject") === "a（b）c".replace("）c", "），c")) // a（b），c
    assert(row.getAs[String]("obj") === "（d）")
    assert(row.getAs[Boolean]("combined") === true)
  }

  test("prediction-compat JSON lines match the reference sink shape") {
    import spark.implicits._
    // one extra page that passes every filter but contains no entity —
    // exercises the empty-spo_list line the reference writes for such docs
    val blank = Seq(("https://synth.test/blank/1",
      new java.sql.Timestamp(Corpus.BaseTs),
      "<p>平凡</p>".getBytes("UTF-8"), "这是一段没有任何病灶实体的平凡描述。", "zh"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val pages = Corpus.pages(spark, 60, seed = 42, noisyFrac = 0.0).toDF()
      .unionByName(blank)
    val triples = Extract.triples(pages)
    val js = GoldIO.predictionJson(triples, pages)
    // one line per PROCESSED doc (the reference sink writes only docs that
    // pass the predict loop's filters), even when a doc yields no triples
    assert(js.count() === Extract.prepare(pages,
      graft.pipeline.ExtractorConfig()).count())
    assert(js.count() < pages.count()) // chaff docs are excluded, like run_qa
    val sample = js.filter(col("json").contains("subject_type")).head().getAs[String]("json")
    assert(sample.contains("\"subject_type\""))
    assert(sample.contains("\"relation\""))
    // docs with no triples serialize an empty spo_list, as the reference does
    val empty = js.as[(String, String)].collect()
      .filter(_._2.contains("\"spo_list\":[]"))
    assert(empty.nonEmpty)
  }
}
