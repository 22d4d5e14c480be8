package graft.model

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** M7/M8 loss parity — every closed form is checked against brute force:
  * the CRF partition functions against explicit path enumeration, the CE/BCE
  * slices against hand-expanded arithmetic, and the reference's odd batch
  * normalizations (tagger `+`, class-weighted nested division) pinned. */
class LossSpec extends AnyFunSuite {

  private val K = 4
  private val rnd = new Random(20260816L)

  private def mat(t: Int, k: Int): Array[Array[Double]] =
    Array.fill(t, k)(rnd.nextGaussian())

  private def params(): Losses.CrfParams = Losses.CrfParams(
    startTransitions = Array.fill(K)(rnd.nextGaussian()),
    endTransitions = Array.fill(K)(rnd.nextGaussian()),
    transitions = Array.fill(K, K)(rnd.nextGaussian())
  )

  /** All length-n tag paths over K labels. */
  private def paths(n: Int): Iterator[List[Int]] =
    if (n == 0) Iterator(Nil)
    else paths(n - 1).flatMap(p => (0 until K).iterator.map(_ :: p))

  test("torchcrf log-likelihood matches path enumeration (full mask)") {
    val T = 5
    val e = mat(T, K)
    val p = params()
    val tags = Array.fill(T)(rnd.nextInt(K))
    val mask = Array.fill(T)(true)

    def pathScore(y: List[Int]): Double = {
      val a = y.toArray
      var s = p.startTransitions(a(0)) + e(0)(a(0))
      for (i <- 1 until T) s += p.transitions(a(i - 1))(a(i)) + e(i)(a(i))
      s + p.endTransitions(a(T - 1))
    }
    val logZ = math.log(paths(T).map(y => math.exp(pathScore(y.reverse))).sum)
    val expected = pathScore(tags.toList) - logZ
    val got = Losses.crfLogLikelihood(e, tags, mask, p)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }

  test("torchcrf log-likelihood with a masked tail scores only the prefix") {
    val T = 6
    val keep = 4
    val e = mat(T, K)
    val p = params()
    val tags = Array.fill(T)(rnd.nextInt(K))
    val mask = Array.tabulate(T)(_ < keep)
    // a masked tail must be equivalent to truncating the sequence
    val got = Losses.crfLogLikelihood(e, tags, mask, p)
    val trunc = Losses.crfLogLikelihood(e.take(keep), tags.take(keep), Array.fill(keep)(true), p)
    assert(math.abs(got - trunc) < 1e-12)
  }

  test("hand-rolled forward algorithm matches START-anchored path enumeration") {
    val q = 1; val c = 2
    val steps = q + 2 + c // 5
    val startTag = 0; val stopTag = 1
    val feats = mat(steps, K)
    val trans = Array.fill(K, K)(rnd.nextGaussian()) // trans(to)(from)

    def pathScore(y: List[Int]): Double = {
      val a = y.toArray
      var s = trans(a(0))(startTag) + feats(0)(a(0))
      for (i <- 1 until steps) s += trans(a(i))(a(i - 1)) + feats(i)(a(i))
      s + trans(stopTag)(a(steps - 1))
    }
    val expected = math.log(paths(steps).map(y => math.exp(pathScore(y.reverse))).sum)
    val got = Losses.crfForwardAlg(feats, q, c, trans, startTag, stopTag)
    // the -10000 init underflows to an exact zero contribution in double
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }

  test("hand-rolled score_sentence is the context-window emission+transition sum") {
    val q = 2; val c = 3
    val t = q + 2 + c + 1
    val feats = mat(t, K)
    val tags = Array.fill(t)(rnd.nextInt(K))
    val trans = Array.fill(K, K)(rnd.nextGaussian())
    var expected = 0.0
    for (k <- (q + 2) until (q + 2 + c))
      expected += trans(tags(k))(tags(k - 1)) + feats(k)(tags(k))
    assert(math.abs(Losses.crfScoreSentence(feats, tags, q, c, trans) - expected) < 1e-12)
  }

  test("hand-rolled NLL is forward minus gold and non-negative for the MAP path region") {
    val q = 1; val c = 3
    val steps = q + 2 + c
    val feats = mat(steps, K)
    val tags = Array.fill(steps)(rnd.nextInt(K))
    val trans = Array.fill(K, K)(rnd.nextGaussian())
    val nll = Losses.crfNllHandRolled(feats, tags, q, c, trans, 0, 1)
    val fwd = Losses.crfForwardAlg(feats, q, c, trans, 0, 1)
    val gold = Losses.crfScoreSentence(feats, tags, q, c, trans)
    assert(math.abs(nll - (fwd - gold)) < 1e-12)
  }

  test("torchcrf quirks on a NON-contiguous mask: raw previous tag, count-indexed end tag") {
    // torchcrf._compute_score with mask=[1,0,1]: the i=2 transition uses the
    // RAW tags[1] (even though step 1 is masked out), and the end transition
    // indexes tags[mask.sum()-1] = tags[1] — the tag at position 1, not the
    // last masked position 2. The denominator skips masked steps.
    val T = 3
    val e = mat(T, K)
    val p = params()
    val tags = Array(2, 0, 3)
    val mask = Array(true, false, true)

    val num = p.startTransitions(2) + e(0)(2) +
      p.transitions(0)(3) + e(2)(3) + // raw previous tag 0 (the masked one)
      p.endTransitions(0) // tags[mask.sum()-1] = tags[1] = 0
    // denominator over the two masked steps = truncated [e(0), e(2)] sequence
    val paths2 = for (a <- 0 until K; b <- 0 until K) yield
      p.startTransitions(a) + e(0)(a) + p.transitions(a)(b) + e(2)(b) + p.endTransitions(b)
    val logZ = math.log(paths2.map(math.exp).sum)
    val got = Losses.crfLogLikelihood(e, tags, mask, p)
    assert(math.abs(got - (num - logZ)) < 1e-9, s"got $got expected ${num - logZ}")
  }

  test("BCE boundary probabilities follow torch's log clamp at -100") {
    // pred=1 gold=1 → 0; pred=0 gold=0 → 0; pred=1 gold=0 → 100 (torch clamp);
    // questionFirst=false so the slice is [1, 1+c)
    val b2 = Seq((Array(0.0, 1.0, 0.0, 1.0), Array(0.0, 0.5, 0.5, 0.5), Array(0.0, 1.0, 0.0, 0.0), Array(0.0, 1.0, 1.0, 1.0)))
    val l2 = Seq((0, 3))
    val got = Losses.bceLossStartEnd(b2, l2, questionFirst = false)
    // starts slice [1,4): (p=1,g=1)→0, (p=0,g=0)→0, (p=1,g=0)→100 ⇒ mean 100/3
    // ends slice [1,4): (p=.5,g=1)→log2, (p=.5,g=1)→log2, (p=.5,g=1)→log2 ⇒ mean log2
    val expected = (100.0 / 3 + math.log(2.0)) / 2.0
    assert(!got.isNaN && !got.isInfinite)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }

  test("live batch CRF loss is -sum(llh), independent of dropoutSample") {
    val p = params()
    val batch = (0 until 3).map { _ =>
      val t = 3 + rnd.nextInt(3)
      (mat(t, K), Array.fill(t)(rnd.nextInt(K)), Array.fill(t)(true))
    }
    val llh = batch.map { case (e, t, m) => Losses.crfLogLikelihood(e, t, m, p) }.sum
    assert(math.abs(Losses.crfLoss(batch, p) - (-llh)) < 1e-12)
    assert(math.abs(Losses.crfLoss(batch, p, dropoutSample = 3) - Losses.crfLoss(batch, p)) < 1e-12)
  }

  test("class-weighted CRF loss pins the nested in-loop division quirk") {
    val p = params()
    val batch = (0 until 2).map { _ =>
      val t = 4
      (mat(t, K), Array.fill(t)(rnd.nextInt(K)), Array.fill(t)(true))
    }
    val qTypes = Seq(0, 1)
    val w = Map(0 -> 2.0, 1 -> 0.5)
    val s = batch.zip(qTypes).map { case ((e, t, m), qt) =>
      w(qt) * Losses.crfLogLikelihood(e, t, m, p)
    }.sum
    val b = batch.length.toDouble
    // dropout_sample = 1: -(S/B)/1
    assert(math.abs(Losses.crfLossClassWeighted(batch, qTypes, w, p) - (-s / b)) < 1e-12)
    // dropout_sample = 2 with identical samples: loss after s1 = S/B;
    // after s2 = (S/B + S)/B; returned = -that/2 (bert_mrc_list.py:245-256)
    val expected2 = -((s / b + s) / b) / 2.0
    assert(math.abs(Losses.crfLossClassWeighted(batch, qTypes, w, p, dropoutSample = 2) - expected2) < 1e-12)
  }

  test("CE slice matches hand-expanded log-softmax mean") {
    val t = 6
    val logits = mat(t, K)
    val labels = Array.fill(t)(rnd.nextInt(K))
    val from = 1; val len = 4
    val expected = (from until from + len).map { k =>
      val z = logits(k)
      val lse = math.log(z.map(math.exp).sum)
      lse - z(labels(k))
    }.sum / len
    assert(math.abs(Losses.ceSlice(logits, labels, from, len) - expected) < 1e-9)
  }

  test("live CE loss slices [1, 1+q+c) and divides by rows*samples; tagger divides by rows+samples") {
    val rows = (0 until 2).map { _ =>
      (mat(10, K), Array.fill(10)(rnd.nextInt(K)))
    }
    val lens = Seq((2, 3), (3, 4))
    val perRowLive = rows.zip(lens).map { case ((lg, lb), (q, c)) => Losses.ceSlice(lg, lb, 1, q + c) }
    assert(math.abs(Losses.ceLoss(rows, lens) - perRowLive.sum / 2.0) < 1e-12)
    // dropoutSample cancels in the live form
    assert(math.abs(Losses.ceLoss(rows, lens, dropoutSample = 4) - Losses.ceLoss(rows, lens)) < 1e-12)

    val perRowTagger = rows.zip(lens).map { case ((lg, lb), (q, c)) => Losses.ceSlice(lg, lb, q + 2, c) }
    // bert_tagger.py:128 normalizes by len(labels) + dropout_sample (PLUS)
    assert(math.abs(Losses.ceLossTagger(rows, lens) - perRowTagger.sum / (2 + 1).toDouble) < 1e-12)
    assert(math.abs(Losses.ceLossTagger(rows, lens, dropoutSample = 3) -
      3.0 * perRowTagger.sum / (2 + 3).toDouble) < 1e-12)
  }

  test("BCE start/end loss matches hand expansion and respects questionFirst") {
    val t = 10
    def probs() = Array.fill(t)(0.05 + 0.9 * rnd.nextDouble())
    def golds() = Array.fill(t)(rnd.nextInt(2).toDouble)
    val batch = (0 until 2).map(_ => (probs(), probs(), golds(), golds()))
    val lens = Seq((2, 3), (1, 4))

    def bce(p: Array[Double], g: Array[Double], from: Int, len: Int): Double =
      (from until from + len).map(k => -(g(k) * math.log(p(k)) + (1 - g(k)) * math.log(1 - p(k)))).sum / len

    val expQF = batch.zip(lens).map { case ((ps, pe, gs, ge), (q, c)) =>
      bce(ps, gs, 2 + q, c) + bce(pe, ge, 2 + q, c)
    }.sum / (2.0 * batch.length)
    assert(math.abs(Losses.bceLossStartEnd(batch, lens) - expQF) < 1e-12)

    val expCF = batch.zip(lens).map { case ((ps, pe, gs, ge), (_, c)) =>
      bce(ps, gs, 1, c) + bce(pe, ge, 1, c)
    }.sum / (2.0 * batch.length)
    assert(math.abs(Losses.bceLossStartEnd(batch, lens, questionFirst = false) - expCF) < 1e-12)
  }
}
