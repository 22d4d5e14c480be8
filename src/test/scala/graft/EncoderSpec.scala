package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.encode.{CharVocab, Encoder}
import graft.schema.Ontology

/** T8 encoding layout + truncation, and ontology order guards. */
class EncoderSpec extends AnyFunSuite {

  test("layout: [CLS] ctx [SEP] question [SEP], context-first, segments 0/1") {
    val row = Encoder.encode("甲乙丙", "丁戊", 12)
    assert(row.inputIds(0) === CharVocab.CLS)
    assert(row.inputIds(4) === CharVocab.SEP)
    assert(row.inputIds(7) === CharVocab.SEP)
    assert(row.inputIds(8) === CharVocab.PAD)
    assert(row.segmentIds.take(5).toSeq === Seq(0, 0, 0, 0, 0))
    assert(row.segmentIds.slice(5, 8).toSeq === Seq(1, 1, 1))
    assert(row.inputMask.count(_ == 1) === 8)
    assert(row.lenContext === 3 && row.lenQuestion === 2)
  }

  test("longest-first truncation trims the context, keeps the question") {
    val ctx = "子" * 100
    val q = "丑寅卯"
    val row = Encoder.encode(ctx, q, 32)
    assert(row.lenQuestion === 3)
    assert(row.lenContext === 32 - 3 - 3)
    assert(3 + row.lenContext + row.lenQuestion === 32)
  }

  test("truncation alternates when both sides exceed the budget") {
    val row = Encoder.encode("甲" * 20, "乙" * 20, 23)
    assert(3 + row.lenContext + row.lenQuestion === 23)
    assert(math.abs(row.lenContext - row.lenQuestion) <= 1)
  }

  test("vocab ids are stable and dense") {
    assert(CharVocab.size === CharVocab.chars.size + 4)
    assert(CharVocab.id('肺') >= 4)
    assert(CharVocab.id('\u2603') === CharVocab.UNK) // not in corpus charset
  }

  test("ontology iteration order matches the reference's dict insertion order") {
    assert(Ontology.subject2question.keys.toSeq ===
      Seq("Mass", "Lymph", "Pleura", "Effusion"))
    assert(Ontology.relation2question.keys.toSeq === Seq(
      "Location", "Shape", "Size", "Density", "Lymph", "Pleura", "Bronchus",
      "ChestWall", "Hilus", "Vessel", "Intension", "PulmonaryAtelectasis", "Esophagus"))
    assert(Ontology.questionTurn("Mass").size === 12)
    assert(Ontology.numLabels === 36)
    // B ids even 2..34; I = B+1
    Ontology.id2relation.keys.foreach { b =>
      assert(b % 2 === 0 && b >= 2 && b <= 34)
    }
  }
}
