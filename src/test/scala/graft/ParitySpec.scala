package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.eval.Metrics
import graft.eval.Metrics.EvalSample
import graft.functions.Spans
import graft.schema.{GoldTriple, Span, Triple}

/** Cross-language parity: the fixture at resources/parity/ was produced by
  * executing the REFERENCE'S OWN python functions (utils/evaluate_funcs.py,
  * torch stubbed) on seeded inputs; this suite replays the same inputs
  * through the Scala ports and requires identical outputs. Regenerate with
  * the script in the fixture's sibling README (seed 20260816).
  */
class ParitySpec extends SparkSpec {

  private lazy val root: JsonNode = {
    val in = getClass.getResourceAsStream("/parity/reference_outputs.json")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  private def ints(n: JsonNode): Array[Int] = n.elements().asScala.map(_.asInt()).toArray
  private def spans(n: JsonNode): List[Span] =
    n.elements().asScala.map(p => Span(p.get(0).asInt(), p.get(1).asInt())).toList

  test("D1 get_indices_from_lable: 120 random rows match the reference") {
    root.get("indices").elements().asScala.foreach { c =>
      val got = Spans.indicesFromLabel(ints(c.get("label")), c.get("b").asInt())
      assert(got === spans(c.get("expected")), c.toString.take(200))
    }
  }

  test("D4 rectify_indices: 60 random cases match the reference") {
    root.get("rectify").elements().asScala.foreach { c =>
      val got = Spans.rectifyIndices(c.get("context").asText(),
        spans(c.get("pred")), c.get("goldLen").asInt())
      assert(got === spans(c.get("expected")), c.toString.take(200))
    }
  }

  test("D5 blurred overlap quirk: 40 random cases match the reference") {
    root.get("blurred").elements().asScala.foreach { c =>
      val got = Spans.blurredMatchCount(spans(c.get("gold")), spans(c.get("pred")))
      assert(got === c.get("expected").asInt(), c.toString.take(200))
    }
  }

  test("D3 get_index_number matches the reference") {
    root.get("index_number").elements().asScala.foreach { c =>
      assert(Spans.indexNumber(ints(c.get("gold"))) === c.get("expected").asInt())
    }
  }

  test("compute_performance macro scores match the reference bit-for-bit") {
    import spark.implicits._
    val perf = root.get("perf")
    val samples = perf.get("samples").elements().asScala.map { s =>
      (s.get("type").asInt(), EvalSample(s.get("type").asInt(),
        ints(s.get("gold")), ints(s.get("pred"))))
    }.toSeq
    val perType = Metrics.computePerformance(spark.createDataset(samples))
    implicit val sp = spark
    val macros = Metrics.macroScores(perType, samples.size.toLong)
    assert(macros("precision") === perf.get("precision").asDouble())
    assert(macros("recall") === perf.get("recall").asDouble())
    assert(macros("f1") === perf.get("f1").asDouble())
    assert(math.abs(macros("acc") - perf.get("acc").asDouble()) < 1e-9)
  }

  test("T1/T2/T3: 300 randomized adversarial strings match the reference byte-for-byte") {
    // the north_rule's #1 invariant (byte-identical extracted text per url),
    // machine-checked against the reference's own clean_data/process_sent on
    // url fragments, paren runs, mixed-width punctuation, unicode whitespace
    var n = 0
    root.get("textnorm").elements().asScala.foreach { c =>
      val in = c.get("in").asText()
      val gotClean = graft.functions.TextNorm.cleanDataStr(in)
      val gotProc = graft.functions.TextNorm.processSentStr(in)
      assert(gotClean.getBytes("UTF-8").toSeq === c.get("clean").asText().getBytes("UTF-8").toSeq,
        s"clean_data mismatch on: ${in.take(80)}")
      assert(gotProc.getBytes("UTF-8").toSeq === c.get("process").asText().getBytes("UTF-8").toSeq,
        s"process_sent mismatch on: ${in.take(80)}")
      n += 1
    }
    assert(n === 300)
  }

  test("cal_triple_res doc-exact precision matches the reference") {
    import spark.implicits._
    val tr = root.get("triple_res")
    val docs = tr.get("docs").elements().asScala.zipWithIndex.toSeq
    def triples(field: String) = docs.flatMap { case (d, i) =>
      d.get(field).elements().asScala.map(s =>
        (s"doc-$i", "Mass", s.asText(), "Location", "Location", s.asText()))
    }
    val pred = triples("pred").map(t => Triple(t._1, t._2, t._3, t._4, t._5, t._6)).toDS()
    val gold = triples("gold").map(t =>
      GoldTriple(t._1, t._2, t._3, t._4, t._5, t._6, Span(0, 1), Span(0, 1))).toDS()
    val urls = docs.map { case (_, i) => s"doc-$i" }.toDF("url")
    val got = Metrics.docExactPrecision(pred, gold, urls)
    assert(math.abs(got - tr.get("precision").asDouble()) < 1e-9)
  }
}
