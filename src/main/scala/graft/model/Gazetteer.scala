package graft.model

import scala.util.matching.Regex

import graft.schema.Span

/** The learned "span knowledge" of the tagger, packaged as model weights:
  * per-type literal phrase inventories plus one numeric pattern. At inference
  * the matcher emits a strong bias on the B/I emission scores of matched
  * spans (see Kernel) — the distilled, deterministic stand-in for the
  * reference's trained BERT+CRF head (no network, no checkpoint in sandbox;
  * SURVEY.md §7.4).
  *
  * Turn-2 pairing rule: object spans for (subject mention, relation) are only
  * tagged inside the sentence window (。-delimited) containing an occurrence
  * of the subject mention — the locality a trained extractor learns from the
  * reference's question format `subject_token + relation2question[rel]`
  * (run_qa.py:389-391).
  */
final class Gazetteer(
    val subjectPhrases: Map[String, Seq[String]],
    val objectPhrases: Map[String, Seq[String]],
    val sizeRegex: Regex
) extends Serializable {

  // Per-type phrase lists sorted longest-first for greedy longest-match.
  private val subjSorted: Map[String, Array[String]] =
    subjectPhrases.map { case (k, v) => k -> v.sortBy(-_.length).toArray }
  private val objSorted: Map[String, Array[String]] =
    objectPhrases.map { case (k, v) => k -> v.sortBy(-_.length).toArray }

  /** Greedy longest-match, non-overlapping, left-to-right literal scan. */
  private def matchPhrases(text: String, phrases: Array[String], from: Int, until: Int): List[Span] = {
    val out = List.newBuilder[Span]
    var i = from
    while (i < until) {
      var matched = -1
      var pi = 0
      while (matched < 0 && pi < phrases.length) {
        val p = phrases(pi)
        if (i + p.length <= until && text.startsWith(p, i)) matched = p.length
        pi += 1
      }
      if (matched > 0) { out += Span(i, i + matched); i += matched }
      else i += 1
    }
    out.result()
  }

  private def matchSize(text: String, from: Int, until: Int): List[Span] =
    sizeRegex.findAllMatchIn(text.substring(from, until))
      .map(m => Span(from + m.start, from + m.end)).toList

  /** Turn-1: all subject-type mentions anywhere in the context. */
  def subjectSpans(context: String, subjectType: String): List[Span] =
    matchPhrases(context, subjSorted.getOrElse(subjectType, Array.empty), 0, context.length)

  /** Sentence windows (。-delimited, end-inclusive of the 。) that contain an
    * occurrence of `mention`. */
  private def windows(context: String, mention: String): List[(Int, Int)] = {
    if (mention.isEmpty) return Nil
    val out = List.newBuilder[(Int, Int)]
    var idx = context.indexOf(mention)
    while (idx >= 0) {
      val start = context.lastIndexOf('。', idx) + 1 // 0 if none
      val stopAt = context.indexOf('。', idx)
      val end = if (stopAt < 0) context.length else stopAt + 1
      out += ((start, end))
      idx = context.indexOf(mention, idx + 1)
    }
    out.result().distinct
  }

  /** Turn-2: object spans for (mention, relation) within the mention's
    * sentence window(s). */
  def objectSpans(context: String, mention: String, relation: String): List[Span] =
    windows(context, mention).flatMap { case (s, e) =>
      val lit = matchPhrases(context, objSorted.getOrElse(relation, Array.empty), s, e)
      if (relation == "Size") lit ++ matchSize(context, s, e) else lit
    }.distinct.sortBy(_.start)
}

object Gazetteer {
  /** Model "weights" distilled from the synthetic training lexicon. */
  def fromLexicon(): Gazetteer = new Gazetteer(
    graft.synth.Lexicon.subjects,
    graft.synth.Lexicon.objects,
    "约[0-9]{1,3}×[0-9]{1,3}mm".r
  )
}
