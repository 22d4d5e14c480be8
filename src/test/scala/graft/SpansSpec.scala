package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Spans
import graft.schema.Span

/** D1–D5 + T9 semantics, including the reference's edge behaviors
  * (SURVEY.md §5.2 item 1). */
class SpansSpec extends AnyFunSuite {

  test("D1 decodes B/I runs, end-exclusive") {
    // B=4 (Location), I=5
    val tags = Array(1, 4, 5, 5, 1, 1, 4, 1)
    assert(Spans.indicesFromLabel(tags, 4) === List(Span(1, 4), Span(6, 7)))
  }

  test("D1 restarts on adjacent B tags") {
    val tags = Array(4, 4, 5, 4, 1)
    // ref scan: span [0,1) (next is B not I), then [1,3), then [3,4)
    assert(Spans.indicesFromLabel(tags, 4) === List(Span(0, 1), Span(1, 3), Span(3, 4)))
  }

  test("D1 ignores other tag ids and orphan I tags") {
    val tags = Array(5, 5, 1, 2, 3, 1)
    assert(Spans.indicesFromLabel(tags, 4) === Nil)
    assert(Spans.indicesFromLabel(tags, 2) === List(Span(3, 5)))
  }

  test("D3 first nonzero tag id") {
    assert(Spans.indexNumber(Array(0, 0, 8, 9)) === 8)
    assert(Spans.indexNumber(Array(0, 0, 0)) === 0)
    assert(Spans.indexNumber(Array[Int]()) === 0)
  }

  test("D4 envelope merge when gold has one span but several predicted") {
    val ctx = "零一二三四五六七八九十"
    val pred = List(Span(6, 8), Span(1, 3))
    assert(Spans.rectifyIndices(ctx, pred, goldLen = 1) === List(Span(1, 8)))
    // goldLen > 1: no merge
    assert(Spans.rectifyIndices(ctx, pred, goldLen = 2) === List(Span(6, 8), Span(1, 3)))
  }

  test("D4 truncates at first （ else first 。") {
    val ctx = "结节影（见图）其余。尾部"
    assert(Spans.rectifyIndices(ctx, List(Span(0, 10)), 2) === List(Span(0, 3)))
    val ctx2 = "结节影見图其余。尾部"
    assert(Spans.rectifyIndices(ctx2, List(Span(0, 9)), 2) === List(Span(0, 7)))
    assert(Spans.rectifyIndices("abc", Nil, 1) === Nil)
  }

  test("D5 overlap test reproduces the reference's always-true quirk") {
    // disjoint spans still "overlap" under the reference condition
    assert(Spans.blurredMatchCount(List(Span(0, 2)), List(Span(5, 9))) === 1)
    assert(Spans.blurredMatchCount(List(Span(5, 9)), List(Span(0, 2))) === 1)
    assert(Spans.blurredMatchCount(Nil, List(Span(0, 1))) === 0)
    assert(Spans.blurredMatchCount(List(Span(0, 1)), Nil) === 0)
  }

  test("T9 label layout: B at 1+s, I over (1+s, e]") {
    val lab = Spans.bioLabels(12, 8, Seq(Span(2, 5)))
    assert(lab(3) === 8)
    assert(lab(4) === 9 && lab(5) === 9)
    assert(lab(6) === 0 && lab(2) === 0)
  }

  test("property: D1 ∘ T9 round-trips disjoint span sets (CLS shift)") {
    val rng = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val n = rng.nextInt(5)
      val spans = (1 to n)
        .map(_ => (rng.nextInt(40), 1 + rng.nextInt(5)))
        .sortBy(_._1)
        .foldLeft(List.empty[(Int, Int)]) { case (acc, (s, l)) =>
          val start = acc.headOption.map { case (_, pe) => math.max(s, pe + 1) }.getOrElse(s)
          (start, start + l) :: acc
        }.reverse
      val maxSeq = 64
      val inWindow = spans.filter(_._2 + 1 < maxSeq)
      val lab = Spans.bioLabels(maxSeq, 8, inWindow.map { case (s, e) => Span(s, e) })
      // decode over the label row shifted by the [CLS] slot, as the CRF path
      // does (labels[1:] ⇒ index 0 = context char 0)
      val decoded = Spans.indicesFromLabel(lab.drop(1), 8)
      assert(decoded === inWindow.map { case (s, e) => Span(s, e) })
    }
  }
}
