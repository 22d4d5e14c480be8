package graft.encode

import graft.schema.Ontology
import graft.synth.Lexicon

/** T8 — char-level pair encoding, mirroring the reference's
  * `encode_plus(text=[char for char in text], text_pair=[char for char in q],
  * max_length, add_special_tokens=True, pad_to_max_length=True, truncation=True)`
  * usage (run_qa.py:441-448, data/data_utils.py:494-497):
  * layout `[CLS] context [SEP] question [SEP] PAD…`, context FIRST, so that
  * after the CRF strips [CLS] (models/bert_mrc.py:199-205) tag index 0 is
  * context char 0.
  */
object CharVocab {
  val PAD = 0
  val UNK = 1
  val CLS = 2
  val SEP = 3

  /** Deterministic vocabulary: ASCII printable + every char reachable from
    * the ontology questions, lexicons, and corpus templates; ids assigned in
    * codepoint order starting at 4. */
  val chars: Vector[Char] = {
    // NB: pattern-generated phrases (Size: 约NN×MMmm) contribute chars that
    // appear in no lexicon literal — they must be listed here explicitly
    val template = "胸部CT检查所见：余未见异常。报告编号复查对照扫描序号肝脏及胆囊区密度影，-（）" +
      Lexicon.sizePhrase(1234567890, 0) +
      Lexicon.toFullWidthDigits(Lexicon.sizePhrase(1234567890, 0)) + "。、"
    val all = (0x20 to 0x7E).map(_.toChar).mkString +
      Ontology.subject2question.values.mkString +
      Ontology.relation2question.values.mkString +
      Lexicon.allPhrases.map(_._2).mkString + template
    all.distinct.sorted.toVector
  }

  val charToId: Map[Char, Int] = chars.zipWithIndex.map { case (c, i) => c -> (i + 4) }.toMap
  val size: Int = chars.size + 4

  // flat lookup table: no per-char boxing in the encode hot loop
  private val idTable: Array[Int] = {
    val t = Array.fill(Char.MaxValue + 1)(UNK)
    charToId.foreach { case (c, i) => t(c) = i }
    t
  }

  @inline def id(c: Char): Int = idTable(c)
}

final case class EncodedRow(
    inputIds: Array[Int],
    inputMask: Array[Int],
    segmentIds: Array[Int],
    lenQuestion: Int,
    lenContext: Int
)

object Encoder {

  /** Encode (context, question) into fixed-width arrays. Truncation is
    * longest-first (HuggingFace `truncation=True` default): trim the longer
    * sequence one char at a time until 3 + |ctx| + |q| <= maxSeq. HF's
    * truncate_sequences pops `ids` (the context) only when STRICTLY longer
    * than `pair_ids` — ties trim the QUESTION, so the tie-break must too. */
  def encode(context: String, question: String, maxSeq: Int): EncodedRow = {
    var lenCtx = context.length
    var lenQ = question.length
    while (3 + lenCtx + lenQ > maxSeq) {
      if (lenCtx > lenQ) lenCtx -= 1 else lenQ -= 1
    }
    val ids = new Array[Int](maxSeq)
    val mask = new Array[Int](maxSeq)
    val seg = new Array[Int](maxSeq)
    var p = 0
    ids(p) = CharVocab.CLS; mask(p) = 1; p += 1
    var i = 0
    while (i < lenCtx) { ids(p) = CharVocab.id(context.charAt(i)); mask(p) = 1; p += 1; i += 1 }
    ids(p) = CharVocab.SEP; mask(p) = 1; p += 1
    i = 0
    while (i < lenQ) {
      ids(p) = CharVocab.id(question.charAt(i)); mask(p) = 1; seg(p) = 1; p += 1; i += 1
    }
    ids(p) = CharVocab.SEP; mask(p) = 1; seg(p) = 1
    EncodedRow(ids, mask, seg, lenQ, lenCtx)
  }

  /** `question_first=True` layout: `[CLS] question [SEP] context [SEP]` —
    * the default-off variant whose eval slice arithmetic lives at
    * utils/evaluate_funcs.py:433-436 (context then occupies token positions
    * `[2 + lenQ, 2 + lenQ + lenCtx)`). Same longest-first truncation;
    * segment 1 marks the SECOND sequence (here the context). */
  def encodeQuestionFirst(context: String, question: String, maxSeq: Int): EncodedRow = {
    var lenCtx = context.length
    var lenQ = question.length
    while (3 + lenCtx + lenQ > maxSeq) {
      if (lenCtx > lenQ) lenCtx -= 1 else lenQ -= 1
    }
    val ids = new Array[Int](maxSeq)
    val mask = new Array[Int](maxSeq)
    val seg = new Array[Int](maxSeq)
    var p = 0
    ids(p) = CharVocab.CLS; mask(p) = 1; p += 1
    var i = 0
    while (i < lenQ) { ids(p) = CharVocab.id(question.charAt(i)); mask(p) = 1; p += 1; i += 1 }
    ids(p) = CharVocab.SEP; mask(p) = 1; p += 1
    i = 0
    while (i < lenCtx) {
      ids(p) = CharVocab.id(context.charAt(i)); mask(p) = 1; seg(p) = 1; p += 1; i += 1
    }
    ids(p) = CharVocab.SEP; mask(p) = 1; seg(p) = 1
    EncodedRow(ids, mask, seg, lenQ, lenCtx)
  }
}
