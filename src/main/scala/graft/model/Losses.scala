package graft.model

/** M7/M8 — the reference's training losses, ported as pure functions.
  *
  * These close the last two model-math rows of SURVEY §2.5. The engine is an
  * inference/ETL pipeline, so nothing in the hot path calls them; they exist
  * so a user of the reference who also runs its training loop has the same
  * arithmetic available (e.g. for loss-parity audits of an external trainer).
  *
  * Three distinct CRF-loss variants ship in the reference:
  *
  *  1. The LIVE path (`models/bert_mrc.py:156-162`, the model `run_qa.py:27`
  *     imports): `loss += CRF(logits, labels, mask)` per dropout sample,
  *     where `CRF` is pytorch-crf's `CRF(num_labels, batch_first=True)` —
  *     forward returns the SUM over the batch of per-sequence log-likelihoods
  *     — and the returned loss is `-loss / dropout_sample`.
  *     [[Losses.crfLogLikelihood]] / [[Losses.crfLoss]] reproduce this.
  *  2. A class-weighted variant (`models/bert_mrc_list.py:245-256`): each
  *     row's log-likelihood is scaled by `class_weight[question_type]`, and
  *     the accumulator is divided by the batch size INSIDE the per-sample
  *     loop — so with `dropout_sample` > 1, sample k's contribution is
  *     divided by `batchSize^(samples-k+1)` (earlier samples get divided
  *     again by each later sample's normalization). [[Losses.crfLossClassWeighted]]
  *     keeps that quirk; LossSpec pins it.
  *  3. A hand-rolled forward-algorithm/score-sentence pair
  *     (`models/bert_mrc_list.py:446-526`, also in `bert_mrc_dict.py` /
  *     `bert_mrc_decodeslice.py`). DEAD AS SHIPPED: every file defining it
  *     does `from data.data_utils import entity_dic` (`bert_mrc_list.py:37`)
  *     and `data_utils.py` defines no `entity_dic` — the module raises
  *     ImportError before the class can load, and the only call site is
  *     commented out (`bert_mrc_decodeslice.py:249-250`). Ported anyway as
  *     [[Losses.crfForwardAlg]] / [[Losses.crfScoreSentence]] with START/STOP
  *     ids as explicit parameters (the reference's own binding is
  *     unresolvable), verified against brute-force path enumeration.
  *
  * All arithmetic is in Double; the reference computes in float32 but these
  * are reference semantics, not bit-parity targets (no shipped fixture to be
  * bit-identical to).
  */
object Losses {

  /** log(sum(exp(xs))) with the max-shift trick (log_sum_exp_batch,
    * bert_mrc_list.py:44-48). */
  private def logSumExp(xs: Array[Double]): Double = {
    var m = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { if (xs(i) > m) m = xs(i); i += 1 }
    if (m == Double.NegativeInfinity) return Double.NegativeInfinity
    var s = 0.0
    i = 0
    while (i < xs.length) { s += math.exp(xs(i) - m); i += 1 }
    m + math.log(s)
  }

  /** pytorch-crf parameters. `transitions(from)(to)` — torchcrf indexes
    * `transitions[tags[i-1], tags[i]]`. */
  final case class CrfParams(
      startTransitions: Array[Double],
      endTransitions: Array[Double],
      transitions: Array[Array[Double]]
  ) {
    require(transitions.length == startTransitions.length &&
      transitions.forall(_.length == endTransitions.length) &&
      startTransitions.length == endTransitions.length,
      "CRF parameter shapes must agree")
    def numTags: Int = startTransitions.length
  }

  /** One sequence's log-likelihood under pytorch-crf semantics (the LIVE
    * loss core, bert_mrc.py:160 via `torchcrf.CRF.forward`):
    * numerator = start[y0] + e(0,y0) + Σ_{i≥1, mask} (T[y_{i-1},y_i] + e(i,y_i))
    * + end[y_seqEnd]; denominator = forward algorithm over masked steps.
    * `mask(0)` must be true (torchcrf's own precondition).
    *
    * torchcrf quirks for NON-CONTIGUOUS masks, reproduced exactly
    * (`torchcrf._compute_score`): the transition at a masked step i uses the
    * RAW previous tag `tags[i-1]` (even if position i-1 itself is mask=0),
    * and the end transition indexes `tags[mask.sum()-1]` — the tag at
    * position (count of masked steps − 1), NOT the last masked position.
    * For the contiguous tail masks the reference actually feeds, both
    * coincide with the intuitive reading. */
  def crfLogLikelihood(
      emissions: Array[Array[Double]],
      tags: Array[Int],
      mask: Array[Boolean],
      p: CrfParams
  ): Double = {
    val T = emissions.length
    val K = p.numTags
    require(T > 0 && mask(0), "torchcrf requires mask[0] == true")
    require(tags.length == T && mask.length == T)

    // numerator: score of the gold path over masked positions
    var num = p.startTransitions(tags(0)) + emissions(0)(tags(0))
    var maskedCount = 1
    var i = 1
    while (i < T) {
      if (mask(i)) {
        num += p.transitions(tags(i - 1))(tags(i)) + emissions(i)(tags(i))
        maskedCount += 1
      }
      i += 1
    }
    num += p.endTransitions(tags(maskedCount - 1))

    // denominator: masked forward algorithm
    var fv = new Array[Double](K)
    var k = 0
    while (k < K) { fv(k) = p.startTransitions(k) + emissions(0)(k); k += 1 }
    val scratch = new Array[Double](K)
    i = 1
    while (i < T) {
      if (mask(i)) {
        val next = new Array[Double](K)
        var to = 0
        while (to < K) {
          var from = 0
          while (from < K) {
            scratch(from) = fv(from) + p.transitions(from)(to) + emissions(i)(to)
            from += 1
          }
          next(to) = logSumExp(scratch)
          to += 1
        }
        fv = next
      }
      i += 1
    }
    k = 0
    while (k < K) { scratch(k) = fv(k) + p.endTransitions(k); k += 1 }
    num - logSumExp(scratch)
  }

  /** The live batch CRF loss (bert_mrc.py:156-162): per dropout sample the
    * batch log-likelihoods are SUMMED (torchcrf reduction='sum'), samples are
    * summed, and the result is `-total / dropoutSample`. Inference uses one
    * sample; training defaults likewise (`dropout_sample=1`,
    * run_qa.py:70/`models/bert_mrc.py:34`). Identical logits per sample at
    * inference ⇒ pass the batch once and set `dropoutSample`. */
  def crfLoss(
      batch: Seq[(Array[Array[Double]], Array[Int], Array[Boolean])],
      p: CrfParams,
      dropoutSample: Int = 1
  ): Double = {
    val llhSum = batch.iterator.map { case (e, t, m) => crfLogLikelihood(e, t, m, p) }.sum
    -(llhSum * dropoutSample) / dropoutSample
  }

  /** Class-weighted CRF loss (bert_mrc_list.py:245-256, dead as shipped —
    * see object doc #3 for the ImportError): row ix contributes
    * `classWeight(questionType(ix)) * llh(ix)`; the accumulator is divided
    * by the batch size inside EACH sample loop, then the total is negated
    * and divided by `dropoutSample`. The nested division quirk (earlier
    * samples divided by batchSize once per later sample) is preserved. */
  def crfLossClassWeighted(
      batch: Seq[(Array[Array[Double]], Array[Int], Array[Boolean])],
      questionType: Seq[Int],
      classWeight: Int => Double,
      p: CrfParams,
      dropoutSample: Int = 1
  ): Double = {
    require(batch.length == questionType.length)
    val b = batch.length.toDouble
    var loss = 0.0
    var s = 0
    while (s < dropoutSample) { // logit_samples loop
      var ix = 0
      while (ix < batch.length) {
        val (e, t, m) = batch(ix)
        loss += classWeight(questionType(ix)) * crfLogLikelihood(e, t, m, p)
        ix += 1
      }
      loss /= b // the reference divides the RUNNING total inside the loop
      s += 1
    }
    -loss / dropoutSample
  }

  /** Hand-rolled gold-path score (`_score_sentence`,
    * bert_mrc_list.py:446-475; dead as shipped, see object doc #3).
    * `lens = (lenQuestion, lenContext)`; the score covers ONLY the context
    * window `[q+2, q+2+c)`:
    * Σ_k trans(tags(k))(tags(k-1)) + Σ_k feats(k)(tags(k)).
    * `trans(to)(from)` — the hand-rolled code indexes
    * `transitions[pad_stop_tags, pad_start_tags]` = [current, previous].
    * The reference's STOP-padding of positions ≥ q+c+2 never lands inside
    * the summed window, so no STOP id is needed here. */
  def crfScoreSentence(
      feats: Array[Array[Double]],
      tags: Array[Int],
      lenQuestion: Int,
      lenContext: Int,
      trans: Array[Array[Double]]
  ): Double = {
    var score = 0.0
    var k = lenQuestion + 2
    val until = lenQuestion + 2 + lenContext
    require(until <= feats.length && until <= tags.length && k >= 1,
      s"context window [$k,$until) must fit in feats(${feats.length})")
    while (k < until) {
      score += trans(tags(k))(tags(k - 1)) + feats(k)(tags(k))
      k += 1
    }
    score
  }

  /** Hand-rolled forward algorithm (`_forward_alg`,
    * bert_mrc_list.py:477-526; dead as shipped, see object doc #3): init
    * alphas −10000 except `startTag` = 0, recurse
    * fv'(to) = logΣexp_from(feats(i)(to) + trans(to)(from) + fv(from))
    * over the first `q+2+c` steps, terminal adds `trans(stopTag)(·)`.
    * `startTag`/`stopTag` are parameters because the reference's own ids
    * (`entity_dic['<START>']`) are unresolvable (module never imports). */
  def crfForwardAlg(
      feats: Array[Array[Double]],
      lenQuestion: Int,
      lenContext: Int,
      trans: Array[Array[Double]],
      startTag: Int,
      stopTag: Int
  ): Double = {
    val steps = lenQuestion + 2 + lenContext
    require(steps <= feats.length, s"need $steps steps, have ${feats.length}")
    val K = trans.length
    var fv = Array.fill(K)(-10000.0)
    fv(startTag) = 0.0
    val scratch = new Array[Double](K)
    var i = 0
    while (i < steps) {
      val next = new Array[Double](K)
      var to = 0
      while (to < K) {
        var from = 0
        while (from < K) {
          scratch(from) = feats(i)(to) + trans(to)(from) + fv(from)
          from += 1
        }
        next(to) = logSumExp(scratch)
        to += 1
      }
      fv = next
      i += 1
    }
    var k = 0
    while (k < K) { scratch(k) = fv(k) + trans(stopTag)(k); k += 1 }
    logSumExp(scratch)
  }

  /** Hand-rolled per-row NLL: forward − gold (the standard composition the
    * dead call site sketches, bert_mrc_decodeslice.py:249-250). */
  def crfNllHandRolled(
      feats: Array[Array[Double]],
      tags: Array[Int],
      lenQuestion: Int,
      lenContext: Int,
      trans: Array[Array[Double]],
      startTag: Int,
      stopTag: Int
  ): Double =
    crfForwardAlg(feats, lenQuestion, lenContext, trans, startTag, stopTag) -
      crfScoreSentence(feats, tags, lenQuestion, lenContext, trans)

  /** torch CrossEntropyLoss (mean reduction) over one slice of a row:
    * −mean_k log softmax(logits(k))(label(k)). */
  def ceSlice(logits: Array[Array[Double]], labels: Array[Int], from: Int, len: Int): Double = {
    require(from >= 0 && from + len <= logits.length && len > 0,
      s"slice [$from,${from + len}) must be non-empty and fit ${logits.length}")
    var total = 0.0
    var k = from
    while (k < from + len) {
      val row = logits(k)
      total += logSumExp(row) - row(labels(k))
      k += 1
    }
    total / len
  }

  /** M8 live CE loss (bert_mrc.py:164-195, `loss_sign == "ce"`): per row the
    * CE is taken over `[1, 1 + lenQ + lenCtx)` (CLS skipped, question AND
    * context both scored), summed over rows and dropout samples, divided by
    * `rows * dropoutSample`. */
  def ceLoss(
      batch: Seq[(Array[Array[Double]], Array[Int])],
      lens: Seq[(Int, Int)],
      dropoutSample: Int = 1
  ): Double = {
    require(batch.length == lens.length)
    var loss = 0.0
    batch.zip(lens).foreach { case ((logits, labels), (q, c)) =>
      loss += ceSlice(logits, labels, 1, q + c)
    }
    (loss * dropoutSample) / (batch.length * dropoutSample)
  }

  /** The tagger CE variant (bert_tagger.py:108-128): slice is the CONTEXT
    * window `[q+2, q+2+c)` and — faithful quirk — the normalizer is
    * `len(labels) + dropout_sample` (PLUS, not times; bert_tagger.py:128). */
  def ceLossTagger(
      batch: Seq[(Array[Array[Double]], Array[Int])],
      lens: Seq[(Int, Int)],
      dropoutSample: Int = 1
  ): Double = {
    require(batch.length == lens.length)
    var loss = 0.0
    batch.zip(lens).foreach { case ((logits, labels), (q, c)) =>
      loss += ceSlice(logits, labels, q + 2, c)
    }
    (loss * dropoutSample) / (batch.length + dropoutSample)
  }

  /** torch BCELoss (mean) over a probability slice. Like torch, log is
    * clamped at −100 so boundary probabilities stay finite: pred=1, gold=1
    * scores 0 (not 0·−∞ = NaN) and pred=0, gold=1 scores 100 — a saturated
    * sigmoid must not poison a parity audit. */
  private def bceSlice(pred: Array[Double], gold: Array[Double], from: Int, len: Int): Double = {
    require(from >= 0 && from + len <= pred.length && len > 0)
    var total = 0.0
    var k = from
    while (k < from + len) {
      val p = pred(k)
      require(p >= 0.0 && p <= 1.0, s"BCE input out of [0,1]: $p")
      val lp = math.max(math.log(p), -100.0)
      val l1p = math.max(math.log(1.0 - p), -100.0)
      total += -(gold(k) * lp + (1.0 - gold(k)) * l1p)
      k += 1
    }
    total / len
  }

  /** M8 start/end BCE loss (bert_mrc.py:166-177, the `labels tuple` branch
    * the M9 start_end head trains with): per row, BCE over the context slice
    * of the start probabilities plus BCE over the same slice of the end
    * probabilities; slice start is `2 + lenQ` when questionFirst (the
    * shipped layout) else 1; total divided by `2 * rows`. */
  def bceLossStartEnd(
      batch: Seq[(Array[Double], Array[Double], Array[Double], Array[Double])],
      lens: Seq[(Int, Int)],
      questionFirst: Boolean = true
  ): Double = {
    require(batch.length == lens.length)
    var loss = 0.0
    batch.zip(lens).foreach { case ((ps, pe, gs, ge), (q, c)) =>
      val from = if (questionFirst) 2 + q else 1
      loss += bceSlice(ps, gs, from, c) + bceSlice(pe, ge, from, c)
    }
    loss / (2.0 * batch.length)
  }
}
