package graft.functions

import graft.schema.Span

/** Span decode / post-processing primitives (SURVEY.md §2.6, D1–D5).
  *
  * Pure Scala functions used both inside the mapPartitions inference kernel
  * (predict path) and from eval UDFs. Each is a faithful port of the
  * reference's semantics, including its quirks — those quirks are part of the
  * P/R contract.
  */
object Spans {

  /** D1 — get_indices_from_lable (utils/evaluate_funcs.py:79-95).
    *
    * Scan a tag sequence: at tag==bId open a span, consume following bId+1
    * I-tags, emit [start, end). The reference's `start_index = end_index - 1`
    * followed by `start_index += 1` resumes the scan AT end_index, so
    * adjacent B-tags each start their own span.
    */
  def indicesFromLabel(label: Array[Int], bId: Int): List[Span] = {
    val out = List.newBuilder[Span]
    var i = 0
    val n = label.length
    while (i < n) {
      if (label(i) == bId) {
        var end = i + 1
        while (end < n && label(end) == bId + 1) end += 1
        out += Span(i, end)
        i = end
      } else {
        i += 1
      }
    }
    out.result()
  }

  /** D3 — get_index_number (utils/evaluate_funcs.py:98-111): the first
    * nonzero tag of a gold row is its question tag id; 0 ⇒ negative sample. */
  def indexNumber(gold: Array[Int]): Int = {
    var i = 0
    while (i < gold.length) {
      if (gold(i) != 0) return gold(i)
      i += 1
    }
    0
  }

  /** D4 — rectify_indices (utils/evaluate_funcs.py:25-42).
    *
    * If gold has exactly 1 span but several were predicted: sort by start and
    * merge to the envelope [min_start, max_end). Then truncate every span at
    * the first `（`, else at the first `。`, inside its text slice.
    */
  def rectifyIndices(context: String, predIn: List[Span], goldLen: Int): List[Span] = {
    if (predIn.isEmpty) return predIn
    val pred =
      if (goldLen == 1 && predIn.length > 1) {
        val sorted = predIn.sortBy(_.start)
        List(Span(sorted.head.start, sorted.last.end))
      } else predIn
    pred.map { sp =>
      val text = context.substring(
        math.max(0, math.min(sp.start, context.length)),
        math.max(0, math.min(sp.end, context.length))
      )
      val iParen = text.indexOf('（')
      if (iParen >= 0) Span(sp.start, sp.start + iParen)
      else {
        val iStop = text.indexOf('。')
        if (iStop >= 0) Span(sp.start, sp.start + iStop) else sp
      }
    }
  }

  /** D5 — get_blurred_match_count (utils/evaluate_funcs.py:114-119).
    *
    * Returns 1 if any pred "overlaps" any gold. The reference condition
    * `not (p0 > g1 and p1 < g0)` is effectively always true for any pair
    * (a quirk — p0 > g1 implies p1 > g0 for well-formed spans); reproduced
    * bit-for-bit, NOT fixed.
    */
  def blurredMatchCount(gold: List[Span], pred: List[Span]): Int = {
    for (p <- pred; g <- gold)
      if (!(p.start > g.end && p.end < g.start)) return 1
    0
  }

  /** T9 — BIO label array build (data/data_utils.py:498-507,534-544).
    * Context is placed first after [CLS]: labels[1+s] = B, labels[2+s .. e] = I.
    * Used for fixture generation and encode/decode round-trip tests.
    */
  def bioLabels(maxSeqLength: Int, bId: Int, spans: Seq[Span]): Array[Int] = {
    val lab = new Array[Int](maxSeqLength)
    spans.foreach { sp =>
      if (1 + sp.start < maxSeqLength) lab(1 + sp.start) = bId
      var i = 2 + sp.start
      while (i <= sp.end && i < maxSeqLength) {
        lab(i) = bId + 1
        i += 1
      }
    }
    lab
  }
}
