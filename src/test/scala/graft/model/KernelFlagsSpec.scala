package graft.model

import org.scalatest.funsuite.AnyFunSuite

import graft.encode.{CharVocab, Encoder}
import graft.functions.Spans
import graft.schema.Span

/** The reference's default-off model flags: M3 `--use_rnn` BiLSTM re-encoder
  * and M9 `--start_end` softmax-threshold decode. */
class KernelFlagsSpec extends AnyFunSuite {

  private val text = "胸部CT检查所见：孤立性结节，左肺上叶，类圆形，约12×8mm，实性密度。"
  private val question = "影像中描述的病灶是什么？"
  private def row = Encoder.encode(text, question, 168)

  test("M3: BiLSTM re-encoder decodes the same biased spans; default weights untouched") {
    val bias = List(Span(8, 13))
    val base = new Kernel(KernelConfig(), CharVocab.size)
    val rnn = new Kernel(KernelConfig(useRnn = true), CharVocab.size)
    val want = Spans.indicesFromLabel(base.tag(row, bias, 2), 2)
    assert(want === List(Span(8, 13)))
    // the RNN stack changes the compute shape, not the decision: the
    // gazetteer bias stays decisive over the tanh-bounded classifier output
    assert(Spans.indicesFromLabel(rnn.tag(row, bias, 2), 2) === want)
    // determinism: independent instances produce identical tags
    val rnn2 = new Kernel(KernelConfig(useRnn = true), CharVocab.size)
    assert(rnn.tag(row, bias, 2).toSeq === rnn2.tag(row, bias, 2).toSeq)
    // flag weights come from an independent stream: the default kernel's
    // decode is bit-identical whether or not a useRnn kernel also exists
    val base2 = new Kernel(KernelConfig(), CharVocab.size)
    assert(base.tag(row, bias, 2).toSeq === base2.tag(row, bias, 2).toSeq)
  }

  test("M9: start/end threshold decode recovers spans; mass-splitting quirk pinned") {
    val k = new Kernel(KernelConfig(), CharVocab.size)
    // one answer: ~all softmax mass on the biased positions
    assert(k.startEndSpans(row, List(Span(8, 13))) === List(Span(8, 13)))
    // two answers: each start/end gets ~0.5 > 0.3
    val two = List(Span(2, 6), Span(16, 20))
    assert(k.startEndSpans(row, two) === two)
    // three answers: ~0.333 > 0.3 still decodes
    val three = List(Span(2, 6), Span(10, 14), Span(20, 24))
    assert(k.startEndSpans(row, three) === three)
    // FOUR equally-evidenced answers: mass splits to ~0.25 < 0.3 and the
    // row decodes to NOTHING — the inherent softmax-threshold quirk of the
    // reference's start_end design (bert_mrc.py:207-209)
    val four = List(Span(2, 5), Span(8, 11), Span(14, 17), Span(20, 23))
    assert(k.startEndSpans(row, four) === Nil)
  }
}
