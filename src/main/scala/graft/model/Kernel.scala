package graft.model

import scala.util.Random

import graft.encode.EncodedRow
import graft.schema.{Ontology, Span}

/** The per-partition batched inference kernel — the Spark-side analogue of
  * the reference's BERT→LayerNorm→classifier→CRF forward pass
  * (models/bert_mrc.py:110-205), in pure Scala over primitive float arrays:
  *
  *  - M1  embedding lookup + [[KernelConfig.layers]] transformer blocks
  *  - M2  TF-style LayerNorm, eps 1e-12 (layers/bert_layernorm.py:34-48)
  *  - M10 sin/cos positional encoding (models/bert_mrc.py:44-59, with the
  *        reference's unimported-`math` bug fixed)
  *  - M11 gelu activation (models/bert_basic_model.py:58-62)
  *  - M5  linear token classifier to 36 tags (layers/classifier.py:23-33)
  *  - M6  Viterbi decode with a 36×36 transition matrix forbidding an I-tag
  *        that does not follow its own B/I (models/bert_mrc.py:199-205)
  *
  * Weights are seeded and deterministic. The encoder contributes a bounded
  * (|tanh|·0.5) score; the decisive emission signal is the gazetteer bias
  * (distilled span knowledge, SURVEY.md §7.4), so decoding is exact on clean
  * text while the compute shape (matmuls per batch row) stays faithful.
  */
final case class KernelConfig(
    hidden: Int = 32,
    layers: Int = 1,
    maxSeq: Int = 168,
    seed: Long = 20260816L,
    oBias: Float = 8f,
    spanBias: Float = 16f,
    /** M3 — the reference's `--use_rnn` BiLSTM re-encoder flag (store_true,
      * OFF by default, run_qa.py:69). When on, encoder states pass through
      * `rnnLayers` bidirectional LSTM layers + LayerNorm before the
      * classifier (models/bert_mrc.py:127-146). rnnHidden defaults to 16 —
      * the reference's 128 scaled to this distilled kernel's hidden width
      * (128/768 ≈ 16/32·⅓; the flag reproduces the compute SHAPE, the
      * gazetteer bias stays the decision signal either way). */
    useRnn: Boolean = false,
    rnnHidden: Int = 16,
    rnnLayers: Int = 2,
    /** M9 — the reference's `--start_end` softmax-threshold decode
      * (OFF by default, run_qa.py:73; models/bert_mrc.py:114-120,207-209). */
    startEndThreshold: Float = 0.3f
)

object Kernel {
  /** Interpolated lookup tables for the two transcendentals on the per-token
    * hot path (gelu over seq×4h activations + the tanh logits squash —
    * ~27k `math.tanh` calls per forward otherwise). 4096-point linear
    * interpolation over [-8, 8]: max error ≈ 2e-6, three orders below the
    * O(1e-3) tolerance the gelu approximation note already documents. */
  private[model] object Lut {
    private val N = 4096
    private val LO = -8f
    private val scale = (N - 1) / 16f
    private val geluT = Array.tabulate(N) { i =>
      val x = LO + i / scale
      val x3 = x.toDouble * x * x
      (0.5 * x * (1.0 + math.tanh(0.7978845608028654 * (x + 0.044715 * x3)))).toFloat
    }
    private val tanhT = Array.tabulate(N)(i => math.tanh(LO + i / scale).toFloat)
    // softmax numerator exp(x) for x ∈ [-16, 0] (post max-subtraction the
    // argument is never positive; below -16 the weight is < 1.2e-7 ≈ 0)
    private val expN = 4096
    private val expLo = -16f
    private val expScale = (expN - 1) / 16f
    private val expT = Array.tabulate(expN)(i => math.exp(expLo + i / expScale).toFloat)

    @inline def gelu(x: Float): Float =
      if (x >= 8f) x // gelu(x) → x for large x
      else if (x <= -8f) 0f
      else interp(geluT, x)

    @inline def tanh(x: Float): Float =
      if (x >= 8f) 1f
      else if (x <= -8f) -1f
      else interp(tanhT, x)

    /** exp(x) for x <= 0 (softmax numerators). */
    @inline def expNeg(x: Float): Float =
      if (x >= 0f) 1f
      else if (x <= -16f) 0f
      else {
        val f = (x - expLo) * expScale
        // float rounding can push (x - lo) to the exact range width for x
        // just below the bound → clamp the bin so tbl(i+1) stays in range
        val i0 = f.toInt
        val i = if (i0 >= expN - 1) expN - 2 else i0
        val w = f - i
        expT(i) + (expT(i + 1) - expT(i)) * w
      }

    @inline private def interp(tbl: Array[Float], x: Float): Float = {
      val f = (x - LO) * scale
      val i0 = f.toInt
      val i = if (i0 >= N - 1) N - 2 else i0 // see expNeg: boundary rounding
      val w = f - i
      tbl(i) + (tbl(i + 1) - tbl(i)) * w
    }
  }
}

final class Kernel(val cfg: KernelConfig, vocabSize: Int) extends Serializable {
  import cfg._
  require(!cfg.useRnn || (rnnLayers >= 1 && rnnHidden >= 1),
    s"useRnn needs rnnLayers/rnnHidden >= 1 (got $rnnLayers/$rnnHidden): with " +
      "zero layers the hidden-width states would be read at 2*rnnHidden width")
  private val numLabels = Ontology.numLabels
  private val rng = new Random(seed)

  private def mat(rows: Int, cols: Int): Array[Float] =
    Array.fill(rows * cols)((rng.nextGaussian() * 0.02).toFloat)

  // M1 weights
  private val embed = mat(vocabSize, hidden)
  private val segEmbed = mat(2, hidden)
  private case class Block(wq: Array[Float], wk: Array[Float], wv: Array[Float],
      wo: Array[Float], w1: Array[Float], b1: Array[Float],
      w2: Array[Float], b2: Array[Float])
  private val blocks = Array.fill(layers)(Block(
    mat(hidden, hidden), mat(hidden, hidden), mat(hidden, hidden), mat(hidden, hidden),
    mat(hidden, hidden * 4), new Array[Float](hidden * 4),
    mat(hidden * 4, hidden), new Array[Float](hidden)))
  // M5 classifier
  private val wc = mat(hidden, numLabels)
  private val bc = new Array[Float](numLabels)

  // M3 — optional BiLSTM re-encoder (--use_rnn, models/bert_mrc.py:127-146):
  // 2 bidirectional layers over the encoder states, LayerNorm, then a
  // classifier sized for the 2·rnnHidden output. Weights come from an
  // INDEPENDENT seeded stream so flipping the flag leaves every default-path
  // weight bit-identical. Gate order (i, f, g, o); inference ⇒ the
  // reference's inter-layer dropout 0.5 is identity.
  private final case class LstmDir(w: Array[Float], u: Array[Float], b: Array[Float])
  private final case class LstmLayer(inDim: Int, fwd: LstmDir, bwd: LstmDir)
  @transient private lazy val rnnLayersW: Array[LstmLayer] = {
    val r = new Random(seed ^ 0x9E3779B97F4A7C15L)
    def m(rows: Int, cols: Int) = Array.fill(rows * cols)((r.nextGaussian() * 0.02).toFloat)
    Array.tabulate(rnnLayers) { l =>
      val in = if (l == 0) hidden else 2 * rnnHidden
      def dir() = LstmDir(m(in, 4 * rnnHidden), m(rnnHidden, 4 * rnnHidden),
        new Array[Float](4 * rnnHidden))
      LstmLayer(in, dir(), dir())
    }
  }
  @transient private lazy val wcRnn: Array[Float] = {
    val r = new Random(seed ^ 0x6A09E667F3BCC909L)
    Array.fill(2 * rnnHidden * numLabels)((r.nextGaussian() * 0.02).toFloat)
  }
  private val bcRnn = new Array[Float](numLabels)

  // M9 — start/end pointer heads (--start_end): one scalar score per token
  // position for each head, softmaxed over positions (models/bert_mrc.py:
  // 114-120). Independent seeded stream, same reasoning as the RNN weights.
  @transient private lazy val (wStart, wEnd) = {
    val r = new Random(seed ^ 0xBB67AE8584CAA73BL)
    (Array.fill(hidden)((r.nextGaussian() * 0.02).toFloat),
      Array.fill(hidden)((r.nextGaussian() * 0.02).toFloat))
  }

  // M10 positional encoding table
  private val posEnc: Array[Float] = {
    val pe = new Array[Float](maxSeq * hidden)
    var p = 0
    while (p < maxSeq) {
      var i = 0
      while (i < hidden) {
        val angle = p / math.pow(10000.0, (2 * (i / 2)).toDouble / hidden)
        pe(p * hidden + i) = if (i % 2 == 0) math.sin(angle).toFloat else math.cos(angle).toFloat
        i += 1
      }
      p += 1
    }
    pe
  }

  // M6 transition matrix: -1e4 into I-tag k+1 unless prev ∈ {k, k+1}.
  private val trans: Array[Float] = {
    val t = new Array[Float](numLabels * numLabels)
    var prev = 0
    while (prev < numLabels) {
      var next = 0
      while (next < numLabels) {
        val isI = next >= 3 && next % 2 == 1 // odd ids >=3 are I-tags
        if (isI && prev != next && prev != next - 1) t(prev * numLabels + next) = -1e4f
        next += 1
      }
      prev += 1
    }
    t
  }
  private val startScore: Array[Float] = {
    val s = new Array[Float](numLabels)
    var k = 0
    while (k < numLabels) { if (k >= 3 && k % 2 == 1) s(k) = -1e4f; k += 1 }
    s
  }

  /** Per-thread scratch buffers, GROWN to the largest batch seen: the kernel
    * runs inside a single task thread, so reusing the arrays removes ~200KB+
    * of allocation per row — at 32 executor threads the allocation rate
    * would otherwise saturate the collector and destroy N→4N scaling. Sized
    * in TOKENS (sum of row lengths across the batch), initially one row. */
  private final class Scratch {
    private var cap = 0
    var h, q, k, v, ctx, attnOut, mid, ffnOut, logits: Array[Float] = _
    val scores = new Array[Float](maxSeq) // attention is per row: one row's span
    val dp = new Array[Float](numLabels)
    val dpNext = new Array[Float](numLabels)
    val bp = new Array[Int](maxSeq * numLabels) // Viterbi is per row
    def ensure(tokens: Int): Unit = if (tokens > cap) {
      cap = math.max(tokens, maxSeq)
      h = new Array[Float](cap * hidden)
      q = new Array[Float](cap * hidden)
      k = new Array[Float](cap * hidden)
      v = new Array[Float](cap * hidden)
      ctx = new Array[Float](cap * hidden)
      attnOut = new Array[Float](cap * hidden)
      mid = new Array[Float](cap * hidden * 4)
      ffnOut = new Array[Float](cap * hidden)
      logits = new Array[Float](cap * numLabels)
    }
  }
  @transient private lazy val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  // M2 LayerNorm (gamma=1, beta=0), eps 1e-12
  private def layerNorm(x: Array[Float], seqLen: Int): Unit =
    layerNormDim(x, seqLen, hidden)

  private def layerNormDim(x: Array[Float], seqLen: Int, dim: Int): Unit = {
    var t = 0
    while (t < seqLen) {
      val off = t * dim
      var mu = 0f; var i = 0
      while (i < dim) { mu += x(off + i); i += 1 }
      mu /= dim
      var va = 0f; i = 0
      while (i < dim) { val d = x(off + i) - mu; va += d * d; i += 1 }
      va /= dim
      val inv = (1.0 / math.sqrt(va + 1e-12)).toFloat
      i = 0
      while (i < dim) { x(off + i) = (x(off + i) - mu) * inv; i += 1 }
      t += 1
    }
  }

  @inline private def sigmoid(x: Float): Float =
    (1.0 / (1.0 + math.exp(-x))).toFloat

  /** One BiLSTM layer over `len` tokens of `x` (row-major, `inDim` features):
    * forward and backward passes concatenated per token → len × 2·rnnHidden.
    * Non-default path (M3 flag): per-call allocation is fine. */
  private def biLstm(layer: LstmLayer, x: Array[Float], len: Int): Array[Float] = {
    val h4 = 4 * rnnHidden
    val out = new Array[Float](len * 2 * rnnHidden)
    def run(dir: LstmDir, reverse: Boolean): Unit = {
      val h = new Array[Float](rnnHidden)
      val c = new Array[Float](rnnHidden)
      val gates = new Array[Float](h4)
      var step = 0
      while (step < len) {
        val t = if (reverse) len - 1 - step else step
        System.arraycopy(dir.b, 0, gates, 0, h4)
        var i = 0
        while (i < layer.inDim) {
          val xi = x(t * layer.inDim + i)
          val wRow = i * h4
          var j = 0
          while (j < h4) { gates(j) += xi * dir.w(wRow + j); j += 1 }
          i += 1
        }
        i = 0
        while (i < rnnHidden) {
          val hi = h(i)
          val uRow = i * h4
          var j = 0
          while (j < h4) { gates(j) += hi * dir.u(uRow + j); j += 1 }
          i += 1
        }
        var k = 0
        while (k < rnnHidden) {
          val ig = sigmoid(gates(k))
          val fg = sigmoid(gates(rnnHidden + k))
          val gg = math.tanh(gates(2 * rnnHidden + k).toDouble).toFloat
          val og = sigmoid(gates(3 * rnnHidden + k))
          c(k) = fg * c(k) + ig * gg
          h(k) = og * math.tanh(c(k).toDouble).toFloat
          k += 1
        }
        val base = t * 2 * rnnHidden + (if (reverse) rnnHidden else 0)
        System.arraycopy(h, 0, out, base, rnnHidden)
        step += 1
      }
    }
    run(layer.fwd, reverse = false)
    run(layer.bwd, reverse = true)
    out
  }

  // M11 gelu (tanh approximation of the reference's erf form,
  // models/bert_basic_model.py:58-62; difference is O(1e-3), far below the
  // gazetteer-bias decision margin)
  @inline private def gelu(x: Float): Float =
    Kernel.Lut.gelu(x)

  /** x[seq×h] · w[h×o] -> out[seq×o]. i-outer/j-inner ordering keeps the
    * weight access contiguous (stride 1 over w's row) so the JIT can
    * vectorize — the strided j-outer form is 2-4× slower. */
  private def matmul(x: Array[Float], w: Array[Float], seqLen: Int, h: Int, o: Int,
      bias: Array[Float], out: Array[Float]): Unit = {
    var t = 0
    while (t < seqLen) {
      val xo = t * h
      val oo = t * o
      var j = 0
      if (bias ne null) {
        while (j < o) { out(oo + j) = bias(j); j += 1 }
      } else {
        java.util.Arrays.fill(out, oo, oo + o, 0f)
      }
      var i = 0
      while (i < h) {
        val xi = x(xo + i)
        val wRow = i * o
        j = 0
        while (j < o) { out(oo + j) += xi * w(wRow + j); j += 1 }
        i += 1
      }
      t += 1
    }
  }

  /** Batched encoder forward: contextual hidden states for a PACKED batch —
    * row r occupies token positions [offsets(r), offsets(r) + fullLens(r))
    * of the scratch buffers, `total` = sum of row lengths. Every per-token
    * op (embed, LayerNorm, all matmuls, gelu) runs over the packed buffer in
    * ONE call — the reference's DataLoader(batch_size=32) matmul shape
    * (run_qa.py:167-171) — while attention and its softmax stay per row
    * (each row attends only to its own tokens). Per-row float-op order is
    * identical to a batch of one, so results are bit-identical at any batch
    * size. Writes into the calling thread's scratch `h` buffer. */
  private def forwardBatch(rows: Array[EncodedRow], fullLens: Array[Int],
      offsets: Array[Int], total: Int, sc: Scratch): Array[Float] = {
    val h = sc.h
    var r = 0
    while (r < rows.length) {
      val row = rows(r)
      val off = offsets(r)
      val fl = fullLens(r)
      var t = 0
      while (t < fl) {
        val id = row.inputIds(t)
        val seg = row.segmentIds(t)
        val ho = (off + t) * hidden
        val po = t * hidden
        var i = 0
        while (i < hidden) {
          h(ho + i) = embed(id * hidden + i) + segEmbed(seg * hidden + i) + posEnc(po + i)
          i += 1
        }
        t += 1
      }
      r += 1
    }
    layerNorm(h, total)

    val scale = (1.0 / math.sqrt(hidden.toDouble)).toFloat
    blocks.foreach { blk =>
      val q = sc.q
      val k = sc.k
      val v = sc.v
      matmul(h, blk.wq, total, hidden, hidden, null, q)
      matmul(h, blk.wk, total, hidden, hidden, null, k)
      matmul(h, blk.wv, total, hidden, hidden, null, v)
      // single-head attention, per row (tokens never attend across rows)
      val ctx = sc.ctx
      java.util.Arrays.fill(ctx, 0, total * hidden, 0f)
      val scores = sc.scores
      r = 0
      while (r < rows.length) {
        val off = offsets(r)
        val fl = fullLens(r)
        var ti = 0
        while (ti < fl) {
          val qo = (off + ti) * hidden
          var tj = 0
          var mx = Float.NegativeInfinity
          while (tj < fl) {
            val ko = (off + tj) * hidden
            var s = 0f; var i = 0
            while (i < hidden) { s += q(qo + i) * k(ko + i); i += 1 }
            s *= scale
            scores(tj) = s
            if (s > mx) mx = s
            tj += 1
          }
          var z = 0f
          tj = 0
          while (tj < fl) { scores(tj) = Kernel.Lut.expNeg(scores(tj) - mx); z += scores(tj); tj += 1 }
          tj = 0
          while (tj < fl) {
            val a = scores(tj) / z
            val vo = (off + tj) * hidden
            var i = 0
            while (i < hidden) { ctx(qo + i) += a * v(vo + i); i += 1 }
            tj += 1
          }
          ti += 1
        }
        r += 1
      }
      val attnOut = sc.attnOut
      matmul(ctx, blk.wo, total, hidden, hidden, null, attnOut)
      val hn = total * hidden
      var x = 0
      while (x < hn) { h(x) += attnOut(x); x += 1 }
      layerNorm(h, total)
      // FFN
      val mid = sc.mid
      matmul(h, blk.w1, total, hidden, hidden * 4, blk.b1, mid)
      val mn = total * hidden * 4
      var m = 0
      while (m < mn) { mid(m) = gelu(mid(m)); m += 1 }
      val ffnOut = sc.ffnOut
      matmul(mid, blk.w2, total, hidden * 4, hidden, blk.b2, ffnOut)
      x = 0
      while (x < hn) { h(x) += ffnOut(x); x += 1 }
      layerNorm(h, total)
    }
    h
  }

  /** Full forward + Viterbi for one encoded row.
    *
    * @param biasSpans gazetteer-matched spans in CONTEXT char coordinates
    *                  (token position = 1 + char, context-first layout)
    * @param tagB      B-tag id of the asked question type
    * @return          decoded tag per context char (length lenContext) —
    *                  the reference decodes logits[:,1:] so index 0 is
    *                  context char 0 (models/bert_mrc.py:199-205)
    */
  def tag(row: EncodedRow, biasSpans: List[Span], tagB: Int): Array[Int] =
    tagBatch(Array((row, biasSpans, tagB)))(0)

  /** Packed row length: [CLS] ctx [SEP] q [SEP], clamped to maxSeq —
    * question tokens don't need decoding but do participate in attention.
    * The ONE definition of the row layout length (tagBatch and
    * startEndSpans both index by it). */
  @inline private def rowFullLen(row: EncodedRow): Int =
    math.min(maxSeq, (1 + row.lenContext + 1) + row.lenQuestion + 1)

  /** Batched forward + Viterbi: the per-partition unit of work — callers
    * feed `grouped(batchSize)` chunks (O4/M1, the reference's
    * DataLoader(batch_size=32) physical shape). Results are bit-identical
    * to row-at-a-time calls (see [[forwardBatch]]); one `(row, biasSpans,
    * tagB)` triple per sample, outputs positionally aligned with inputs.
    *
    * Measured batch effect (graft.tools.KernelProbe prints it): ~1.0× on
    * this JVM kernel — the reference's batch win amortizes Python/torch
    * dispatch, while here the per-layer weights (≤16KB) are already
    * L1/L2-resident across consecutive rows, so the batched shape is
    * fidelity + fewer per-call fills, not a FLOP reduction. */
  def tagBatch(reqs: Array[(EncodedRow, List[Span], Int)],
      questionFirst: Boolean = false): Array[Array[Int]] = {
    if (reqs.isEmpty) return Array.empty
    val sc = scratch.get()
    val n = reqs.length
    val rows = new Array[EncodedRow](n)
    val fullLens = new Array[Int](n)
    val offsets = new Array[Int](n)
    var total = 0
    var i = 0
    while (i < n) {
      val row = reqs(i)._1
      rows(i) = row
      fullLens(i) = rowFullLen(row)
      offsets(i) = total
      total += fullLens(i)
      i += 1
    }
    sc.ensure(total)
    val h = forwardBatch(rows, fullLens, offsets, total, sc)
    // M5 classifier + bounded encoder contribution + bias emissions — one
    // packed matmul over the whole batch. Under --use_rnn (M3) the states
    // first pass through the BiLSTM stack + LayerNorm per row and the
    // classifier is sized for the 2·rnnHidden output. (Divergence note: the
    // reference packs lengths as clamp(max_seq)-1 — silently dropping the
    // LAST token from the packed sequence, bert_mrc.py:127-129 — we run the
    // full row, which is the evident intent.)
    val logits = sc.logits
    if (useRnn) {
      var r = 0
      while (r < n) {
        val off = offsets(r)
        val fl = fullLens(r)
        var x = new Array[Float](fl * hidden)
        System.arraycopy(h, off * hidden, x, 0, fl * hidden)
        rnnLayersW.foreach { layer => x = biLstm(layer, x, fl) }
        layerNormDim(x, fl, 2 * rnnHidden)
        val rowLogits = new Array[Float](fl * numLabels)
        matmul(x, wcRnn, fl, 2 * rnnHidden, numLabels, bcRnn, rowLogits)
        System.arraycopy(rowLogits, 0, logits, off * numLabels, fl * numLabels)
        r += 1
      }
    } else matmul(h, wc, total, hidden, numLabels, bc, logits)
    val ln = total * numLabels
    var x = 0
    while (x < ln) { logits(x) = Kernel.Lut.tanh(logits(x)) * 0.5f; x += 1 }
    val out = new Array[Array[Int]](n)
    i = 0
    while (i < n) {
      val (row, biasSpans, tagB) = reqs(i)
      val off = offsets(i)
      val fullLen = fullLens(i)
      var t = 0
      while (t < fullLen) { logits((off + t) * numLabels + 1) += cfg.oBias; t += 1 } // 'O'
      // context char c sits at token position 1 + c (context-first) or
      // 2 + lenQuestion + c (question_first=True layout)
      val ctxBase = if (questionFirst) 2 + row.lenQuestion else 1
      biasSpans.foreach { sp =>
        val bPos = ctxBase + sp.start
        if (bPos < fullLen) logits((off + bPos) * numLabels + tagB) += cfg.spanBias
        var p = bPos + 1
        while (p <= ctxBase - 1 + sp.end && p < fullLen) { logits((off + p) * numLabels + tagB + 1) += cfg.spanBias; p += 1 }
      }
      // decode slice: context-first takes elements [0, lenCtx) of the
      // CLS-stripped decode = positions [1, 1 + lenCtx). question_first
      // reproduces the reference's slice `[2 + lenQ, 2 + lenQ + lenCtx)`
      // OVER the already-CLS-stripped list (evaluate_funcs.py:433-436) =
      // positions [3 + lenQ, 3 + lenQ + lenCtx) — ONE PAST the true context
      // start, so every tag is the next char's and the last is the closing
      // [SEP]'s. Off-by-one quirk of the default-off variant: reproduced,
      // not fixed (the gold labels slice exactly, so P/R degrades — which
      // is what the reference computes when the flag is on).
      out(i) =
        if (questionFirst) viterbi(logits, off, 3 + row.lenQuestion, fullLen, fullLen, sc)
        else viterbi(logits, off, 1, 1 + row.lenContext, fullLen, sc)
      i += 1
    }
    out
  }

  /** M9 — the `--start_end` softmax-threshold decode path
    * (models/bert_mrc.py:114-120,207-209): two pointer heads score every
    * token, each head softmaxes over positions, and positions with
    * probability > threshold become start/end flags; predicted spans pair
    * the i-th start with the i-th end ONLY when the flag counts match, else
    * no spans — exactly the eval branch's pairing rule
    * (utils/evaluate_funcs.py:149-176).
    *
    * Faithful quirks (documented, reproduced where they are semantics, fixed
    * where they are crashes): (a) the softmax-threshold rule means a row
    * with ≥ ⌈1/threshold⌉ equally-evidenced answers decodes to NOTHING —
    * the mass splits below the threshold (inherent to the design; pinned in
    * KernelFlagsSpec); (b) CROSSED flags (an end before its paired start)
    * still pair — the reference slices `text[s:e+1]` into a degenerate
    * empty prediction that never matches gold but does count — so a crossed
    * pair returns a degenerate Span with end ≤ start here too; (c) the
    * reference's start_end metric branch crashes as shipped (undefined
    * `f1_lst`, wrong counter key `'tp'` vs `'tp_precise'`, shadowed loop
    * index — evaluate_funcs.py:149-205), so only the MODEL semantics are
    * ported, like M10's unimported-`math` fix.
    *
    * @return spans in context char coordinates (end-exclusive; a crossed
    *         pair yields end ≤ start — see quirk (b)). */
  def startEndSpans(row: EncodedRow, biasSpans: List[Span],
      threshold: Float = startEndThreshold): List[Span] = {
    val sc = scratch.get()
    val fullLen = rowFullLen(row)
    sc.ensure(fullLen)
    val h = forwardBatch(Array(row), Array(fullLen), Array(0), fullLen, sc)
    def headProbs(w: Array[Float], biasAt: Span => Int): Array[Float] = {
      val s = new Array[Float](fullLen)
      var t = 0
      while (t < fullLen) {
        var acc = 0f; var i = 0
        while (i < hidden) { acc += h(t * hidden + i) * w(i); i += 1 }
        s(t) = Kernel.Lut.tanh(acc) * 0.5f
        t += 1
      }
      biasSpans.foreach { sp =>
        val p = biasAt(sp)
        if (p >= 0 && p < fullLen) s(p) += cfg.spanBias
      }
      // softmax over positions (F.softmax(dim=-1) on the per-token scores)
      var mx = Float.NegativeInfinity
      t = 0
      while (t < fullLen) { if (s(t) > mx) mx = s(t); t += 1 }
      var z = 0f
      t = 0
      while (t < fullLen) { s(t) = math.exp((s(t) - mx).toDouble).toFloat; z += s(t); t += 1 }
      t = 0
      while (t < fullLen) { s(t) /= z; t += 1 }
      s
    }
    // start flag at the span's first char token; end flag at its LAST char
    // token (reference spans are inclusive [s, e] sliced text[s:e+1])
    val pStart = headProbs(wStart, sp => 1 + sp.start)
    val pEnd = headProbs(wEnd, sp => sp.end) // 1 + (sp.end - 1)
    def flags(p: Array[Float]): List[Int] =
      (1 until 1 + row.lenContext).iterator
        .filter(t => t < fullLen && p(t) > threshold).map(_ - 1).toList
    val starts = flags(pStart)
    val ends = flags(pEnd)
    if (starts.nonEmpty && starts.size == ends.size)
      starts.zip(ends).map { case (s, e) => Span(s, e + 1) } // quirk (b): crossed pairs stay
    else Nil
  }

  /** M6 — Viterbi DP over tag positions [from, until) of the row based at
    * token offset `base` in the packed logits buffer. */
  private def viterbi(logits: Array[Float], base: Int, from: Int, until: Int,
      fullLen: Int, sc: Scratch): Array[Int] = {
    val n = math.min(until, fullLen) - from
    if (n <= 0) return Array.empty
    val dp = sc.dp
    val next = sc.dpNext
    val bp = sc.bp
    var k = 0
    while (k < numLabels) { dp(k) = startScore(k) + logits((base + from) * numLabels + k); k += 1 }
    var t = 1
    while (t < n) {
      var j = 0
      while (j < numLabels) {
        var best = Float.NegativeInfinity
        var arg = 0
        var i = 0
        while (i < numLabels) {
          val s = dp(i) + trans(i * numLabels + j)
          if (s > best) { best = s; arg = i }
          i += 1
        }
        next(j) = best + logits((base + from + t) * numLabels + j)
        bp(t * numLabels + j) = arg
        j += 1
      }
      System.arraycopy(next, 0, dp, 0, numLabels)
      t += 1
    }
    var bestK = 0
    var bestV = Float.NegativeInfinity
    k = 0
    while (k < numLabels) { if (dp(k) > bestV) { bestV = dp(k); bestK = k }; k += 1 }
    val tags = new Array[Int](n)
    tags(n - 1) = bestK
    t = n - 1
    while (t > 0) { tags(t - 1) = bp(t * numLabels + tags(t)); t -= 1 }
    tags
  }
}
