package graft

import org.apache.spark.sql.functions._

import graft.functions.{DecodeBioSpans, Spans}
import graft.schema.Span

/** Native decode_bio_spans expression vs the Scala twin, through SQL (the
  * codegen path) and on random inputs. */
class DecodeBioSpansSpec extends SparkSpec {

  private def viaSql(tags: Seq[Int], bId: Int): List[Span] = {
    DecodeBioSpans.register(spark)
    import spark.implicits._
    val df = Seq(Tuple1(tags)).toDF("tags")
    df.selectExpr(s"decode_bio_spans(tags, $bId) AS spans")
      .selectExpr("explode_outer(spans) AS s")
      .selectExpr("s.start", "s.end")
      .collect()
      .filter(!_.isNullAt(0))
      .map(r => Span(r.getInt(0), r.getInt(1)))
      .toList
  }

  test("expression equals the Scala twin on hand cases") {
    val cases = Seq(
      (Seq(1, 4, 5, 5, 1, 4, 1), 4),
      (Seq(4, 4, 5, 4), 4),
      (Seq(5, 5, 1), 4),
      (Seq.empty[Int], 8)
    )
    cases.foreach { case (tags, b) =>
      assert(viaSql(tags, b) === Spans.indicesFromLabel(tags.toArray, b),
        s"tags=$tags b=$b")
    }
  }

  test("expression equals the Scala twin on 200 random rows (codegen path)") {
    DecodeBioSpans.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (1 to 200).map { i =>
      (i, (1 to 30).map(_ => Seq(1, 8, 9, 12, 0)(rng.nextInt(5))))
    }
    val df = rows.toDF("id", "tags")
    val got = df.selectExpr("id", "decode_bio_spans(tags, 8) AS spans").collect()
      .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => Span(s.getInt(0), s.getInt(1))).toList).toMap
    rows.foreach { case (id, tags) =>
      assert(got(id) === Spans.indicesFromLabel(tags.toArray, 8), s"row $id tags=$tags")
    }
  }

  test("expression participates in whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    DecodeBioSpans.register(spark)
    // fail loudly if the generated Java doesn't compile (no silent fallback)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // non-literal input so the projection actually executes in a generated
    // stage instead of being constant-folded into a LocalTableScan
    val df = spark.range(100).selectExpr(
      "transform(sequence(0, 20), i -> CASE WHEN (i + id) % 5 = 0 THEN 8 " +
        "WHEN (i + id) % 5 = 1 THEN 9 ELSE 1 END) AS tags", "id")
      .selectExpr("id", "decode_bio_spans(cast(tags AS array<int>), 8) AS spans")
    val spans = df.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }
    assert(spans.nonEmpty, df.queryExecution.executedPlan.toString)
    // spot-check one row against the Scala twin
    val row = df.filter("id = 3").head()
    val tags = (0 to 20).map(i => if ((i + 3) % 5 == 0) 8 else if ((i + 3) % 5 == 1) 9 else 1)
    val got = row.getSeq[org.apache.spark.sql.Row](1)
      .map(s => Span(s.getInt(0), s.getInt(1))).toList
    assert(got === Spans.indicesFromLabel(tags.toArray, 8))
  }
}
