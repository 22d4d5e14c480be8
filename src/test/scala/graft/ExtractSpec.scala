package graft

import graft.eval.Metrics
import graft.pipeline.{Extract, ExtractorConfig, ExtractorModel}
import graft.synth.Corpus

/** End-to-end golden pipeline (SURVEY.md §7.2): synth corpus → two-turn
  * extraction → triples; P/R vs planted gold. */
class ExtractSpec extends SparkSpec {

  private val cfg = ExtractorConfig()

  test("single-doc extraction reproduces planted triples") {
    val (gaz, kernel) = ExtractorModel.get(cfg.kernel)
    (0L until 60L).filter(i => i % 37 != 0 && i % 41 != 0).foreach { i =>
      val d = Corpus.buildDoc(i, seed = 21, noisyFrac = 0.0)
      val got = Extract.extractDoc(d.page.url, d.page.text, gaz, kernel, cfg)
        .map(t => (t.subjectType, t.subject, t.relation, t.objectType, t.obj)).toSet
      val want = d.gold
        .map(g => (g.subjectType, g.subject, g.relation, g.objectType, g.obj)).toSet
      assert(got === want, s"doc $i text=${d.page.text}")
    }
  }

  test("e2e clean corpus: P = R = 1.0") {
    val pages = Corpus.pages(spark, 400, seed = 42, noisyFrac = 0.0).toDF()
    val gold = Corpus.gold(spark, 400, seed = 42, noisyFrac = 0.0)
    val pred = Extract.triples(pages, cfg)
    val (p, r, f1) = Metrics.tripleSetPR(pred, gold)
    assert(p === 1.0, s"precision $p")
    assert(r === 1.0, s"recall $r")
    assert(f1 === 1.0)
  }

  test("e2e noisy corpus: P/R >= 0.95 but < 1.0 (gate is non-trivial)") {
    val pages = Corpus.pages(spark, 800, seed = 43, noisyFrac = 0.08).toDF()
    val gold = Corpus.gold(spark, 800, seed = 43, noisyFrac = 0.08)
    val pred = Extract.triples(pages, cfg)
    val (p, r, _) = Metrics.tripleSetPR(pred, gold)
    assert(p >= 0.95, s"precision $p")
    assert(r >= 0.95, s"recall $r")
    assert(p < 1.0 || r < 1.0, s"noise should cost something: p=$p r=$r")
  }

  test("partition-count invariance: local[4] result equals single-partition result") {
    val pages4 = Corpus.pages(spark, 200, seed = 9, noisyFrac = 0.05).repartition(7).toDF()
    val pages1 = Corpus.pages(spark, 200, seed = 9, noisyFrac = 0.05).coalesce(1).toDF()
    val a = Extract.triples(pages4, cfg).collect().toSet
    val b = Extract.triples(pages1, cfg).collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("excluded docs produce no triples (F2) and en docs are filtered") {
    val pages = Corpus.pages(spark, 400, seed = 42, noisyFrac = 0.0).toDF()
    val pred = Extract.triples(pages, cfg)
    import spark.implicits._
    val urls = pred.map(_.url).collect().toSet
    (0L until 400L).foreach { i =>
      if (i % 37 == 0 || i % 41 == 0) {
        val d = Corpus.buildDoc(i, 42, 0.0)
        assert(!urls.contains(d.page.url), s"chaff doc $i leaked")
      }
    }
  }

  test("over-length documents truncate safely (spans beyond the window drop)") {
    val (gaz, kernel) = ExtractorModel.get(cfg.kernel)
    val d = Corpus.buildDoc(2, seed = 21, noisyFrac = 0.0)
    // pad far past maxSeq so the context truncates mid-document
    val longText = d.page.text + "其余层面未见明显异常改变。" * 40
    assert(longText.length > cfg.maxSeq)
    val got = Extract.extractDoc(d.page.url, longText, gaz, kernel, cfg)
    // planted content sits at the front, inside the truncation window
    val want = d.gold.map(g => (g.subjectType, g.subject, g.relation, g.obj)).toSet
    assert(got.map(t => (t.subjectType, t.subject, t.relation, t.obj)).toSet === want)
    // and a doc whose mentions sit past the window yields nothing, not a crash
    val shifted = "其余层面未见明显异常改变。" * 40 + d.page.text
    val got2 = Extract.extractDoc(d.page.url, shifted, gaz, kernel, cfg)
    assert(got2.isEmpty)
  }

  test("O6 subject-only branch: dead under the shipped ontology, fires on a trimmed one") {
    import graft.schema.Ontology
    // shipped ontology: every subject type has turn-2 relations ⇒ the
    // run_qa.py:488-496 else-branch never fires (the r1/r2 documentation
    // claim, now pinned)
    Ontology.subject2question.keys.foreach { st =>
      assert(Ontology.questionTurn(st).nonEmpty, s"type $st has no relations")
    }

    val (gaz, kernel) = ExtractorModel.get(cfg.kernel)
    val d = Corpus.buildDoc(3, seed = 21, noisyFrac = 0.0)
    val default = Extract.extractDoc(d.page.url, d.page.text, gaz, kernel, cfg)
    val st = default.head.subjectType
    val trimmed = Ontology.questionTurn.updated(st, Nil)
    val got = Extract.extractDoc(d.page.url, d.page.text, gaz, kernel, cfg, trimmed)

    // the trimmed type yields exactly one subject-only record, from the
    // FIRST RAW decoded span (run_qa.py:489 indices[0], pre-dedup and
    // pre-emptiness-filter — read straight off turn1, not off the default
    // run's first triple, which would only coincidentally agree)
    val onlySt = got.filter(_.subjectType == st)
    val firstRaw = Extract.turn1(d.page.text, gaz, kernel, cfg)
      .collectFirst { case (`st`, _, raw) => raw }.flatten
    assert(firstRaw.nonEmpty, s"fixture must decode at least one span for $st")
    assert(onlySt === List(graft.schema.Triple(d.page.url, st, firstRaw.get, "", "", "")))
    // all other types are untouched
    assert(got.filterNot(_.subjectType == st) === default.filterNot(_.subjectType == st))
  }

  test("doc-exact precision (cal_triple_res) is 1.0 on clean corpus") {
    val pages = Corpus.pages(spark, 300, seed = 42, noisyFrac = 0.0).toDF()
    val gold = Corpus.gold(spark, 300, seed = 42, noisyFrac = 0.0)
    val pred = Extract.triples(pages, cfg)
    val acc = Metrics.docExactPrecision(pred, gold, pages.select("url"))
    assert(acc === 1.0)
  }
}
