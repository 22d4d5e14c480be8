package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNorm
import graft.schema.Ontology
import graft.synth.{Corpus, Lexicon}

/** Lexicon hygiene + corpus determinism + the byte-identity invariant. */
class LexiconSpec extends AnyFunSuite {

  test("lexicons are pairwise substring-disjoint across groups") {
    val all = Lexicon.allPhrases
    for ((ga, pa) <- all; (gb, pb) <- all if ga != gb) {
      assert(!pa.contains(pb) && !pb.contains(pa),
        s"collision: $ga '$pa' vs $gb '$pb'")
    }
  }

  test("phrases are clean_data-invariant and free of excluded organs") {
    Lexicon.allPhrases.foreach { case (g, p) =>
      assert(TextNorm.cleanDataStr(p) === p, s"$g '$p' not clean-invariant")
      Ontology.excludedOrgans.foreach(o => assert(!p.contains(o), s"$g '$p' has $o"))
      assert(!p.contains("。") && !p.contains("，"), s"$g '$p' has a delimiter")
    }
  }

  test("size phrase pattern and full-width variant normalize together") {
    val half = Lexicon.sizePhrase(12, 8)
    assert(half === "约12×8mm")
    val full = Lexicon.toFullWidthDigits(half)
    assert(full !== half)
    assert(TextNorm.processSentStr(full) === half)
  }
}

class CorpusSpec extends AnyFunSuite {

  test("buildDoc is deterministic") {
    (0L until 50L).foreach { i =>
      val a = Corpus.buildDoc(i, seed = 7, noisyFrac = 0.1)
      val b = Corpus.buildDoc(i, seed = 7, noisyFrac = 0.1)
      assert(a.page.text === b.page.text)
      assert(a.gold === b.gold)
      assert(a.page.url === b.page.url)
    }
  }

  test("text is byte-identical to extractText(html) per url") {
    (0L until 200L).foreach { i =>
      val d = Corpus.buildDoc(i, seed = 3, noisyFrac = 0.05)
      assert(TextNorm.extractTextStr(d.page.html).getBytes("UTF-8").toSeq ===
        d.page.text.getBytes("UTF-8").toSeq, s"doc $i")
    }
  }

  test("gold spans slice to their surfaces (text.find semantics)") {
    (0L until 300L).foreach { i =>
      val d = Corpus.buildDoc(i, seed = 11, noisyFrac = 0.0)
      d.gold.foreach { g =>
        assert(d.page.text.substring(g.spanSubject.start, g.spanSubject.end) === g.subject)
        assert(d.page.text.substring(g.spanObject.start, g.spanObject.end) === g.obj)
        assert(d.page.text.indexOf(g.subject) === g.spanSubject.start)
        assert(d.page.text.indexOf(g.obj) === g.spanObject.start)
      }
    }
  }

  test("gold respects the ontology (types, relations, object_type==relation)") {
    (0L until 300L).foreach { i =>
      val d = Corpus.buildDoc(i, seed = 5, noisyFrac = 0.0)
      d.gold.foreach { g =>
        assert(Ontology.questionTurn.contains(g.subjectType))
        assert(Ontology.questionTurn(g.subjectType).contains(g.relation))
        assert(g.objectType === g.relation)
      }
      // a relation appears for at most one subject per doc
      val perRel = d.gold.groupBy(_.relation).values
      perRel.foreach(ts => assert(ts.map(_.subject).distinct.size == 1))
    }
  }

  test("chaff docs carry no gold") {
    assert(Corpus.buildDoc(37, 1, 0).gold.isEmpty) // en doc
    assert(Corpus.buildDoc(41, 1, 0).gold.isEmpty) // excluded-organ doc
    assert(Corpus.buildDoc(37, 1, 0).page.lang === "en")
    assert(Corpus.buildDoc(41, 1, 0).page.text.contains("肝"))
  }
}
