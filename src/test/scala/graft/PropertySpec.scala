package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.encode.Encoder
import graft.functions.Spans
import graft.ops.Hashing
import graft.schema.Span

/** Pure-JVM property tests (ScalaCheck runs them under sbt's test task):
  * algebraic invariants of the span codec, the simhash banding, the
  * content-normalized fingerprint, and the encoder's truncation contract —
  * the randomized complement to the example-driven ParitySpec. */
object GraftProperties extends Properties("graft") {

  // ----- D1/T9: bioLabels ∘ indicesFromLabel round-trips any valid span set

  private val genSpanSet: Gen[(Int, List[Span])] = for {
    len <- Gen.choose(1, 160)
    // random non-overlapping spans: cut points paired into [s, e) runs,
    // keeping a gap or exact adjacency between consecutive spans
    cuts <- Gen.listOf(Gen.choose(0, len)).map(_.distinct.sorted)
  } yield (len, cuts.grouped(2).collect { case List(s, e) if s < e => Span(s, e) }.toList)

  property("bio round-trip: decode(encode(spans)) == spans") =
    forAll(genSpanSet, Gen.choose(1, 17).map(_ * 2)) { case ((len, spans), bId) =>
      val inBounds = spans.filter(_.end <= len)
      val bio = Spans.bioLabels(len + 1, bId, inBounds)
      Spans.indicesFromLabel(bio.drop(1), bId) == inBounds
    }

  property("indexNumber finds the first planted tag id") =
    forAll(genSpanSet, Gen.choose(1, 17).map(_ * 2)) { case ((len, spans), bId) =>
      val inBounds = spans.filter(_.end <= len)
      val bio = Spans.bioLabels(len + 1, bId, inBounds)
      Spans.indexNumber(bio) == (if (inBounds.isEmpty) 0 else bId)
    }

  // ----- simhash banding: keys partition the 64 bits; pigeonhole recall

  property("simhashBandKeys reassemble to the original signature") =
    forAll(Gen.long, Gen.choose(1, 64)) { (sim, bands) =>
      val keys = Hashing.simhashBandKeys(sim, bands)
      val base = 64 / bands
      val rem = 64 % bands
      var rebuilt = 0L
      var offset = 0
      keys.zipWithIndex.foreach { case (k, b) =>
        val width = if (b < rem) base + 1 else base
        rebuilt |= k << offset
        offset += width
      }
      keys.length == bands && rebuilt == sim
    }

  property("pigeonhole: hamming <= bands-1 implies a shared whole band") =
    forAll(Gen.long, Gen.choose(2, 16), Gen.choose(0, 63)) { (sim, bands, seed0) =>
      // flip at most bands-1 distinct bits
      val nFlips = seed0 % bands // 0..bands-1
      val bits = Iterator.iterate(Hashing.splitmix64(seed0))(Hashing.splitmix64)
        .map(b => (b & 63L).toInt).distinct.take(nFlips).toList
      val other = bits.foldLeft(sim)((s, b) => s ^ (1L << b))
      val ka = Hashing.simhashBandKeys(sim, bands)
      val kb = Hashing.simhashBandKeys(other, bands)
      ka.zip(kb).exists { case (a, b) => a == b }
    }

  // ----- normalized fingerprint: formatting-invariant, content-sensitive

  private val genTokens: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("alpha", "Beta", "GAMMA", "肺部", "δ", "x1"))
  private val genWs: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "  ", "\t", "\n", " \t ")).map(_.mkString)

  property("normalizedFingerprint is whitespace- and case-invariant") =
    forAll(genTokens, genWs, genWs) { (toks, ws1, ws2) =>
      val a = toks.mkString(" ")
      val b = ws1 + toks.map(_.toUpperCase).mkString(ws2) + ws1
      Hashing.normalizedFingerprint(a) == Hashing.normalizedFingerprint(b)
    }

  property("simhashFeatures empty iff normalized text is blank") =
    forAll(genWs) { ws =>
      Hashing.simhashFeatures(ws).isEmpty &&
        Hashing.simhashFeatures(null).isEmpty &&
        Hashing.simhashFeatures(ws + "x" + ws).nonEmpty
    }

  // ----- T8 encoder truncation contract

  private val genText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('肺', '部', '，', ' ')))
      .map(_.mkString)

  property("encode: fixed width, budget respected, context-first layout") =
    forAll(genText, genText, Gen.choose(8, 168)) { (ctx, q, maxSeq) =>
      val row = Encoder.encode(ctx, q, maxSeq)
      Prop.all(
        Prop(row.inputIds.length == maxSeq) :| "fixed width",
        Prop(row.inputMask.length == maxSeq && row.segmentIds.length == maxSeq) :| "parallel arrays",
        Prop(3 + row.lenContext + row.lenQuestion <= maxSeq) :| "token budget",
        Prop(row.lenContext <= ctx.length && row.lenQuestion <= q.length) :| "truncate only",
        // context occupies segment 0 right after [CLS]
        Prop((1 until 1 + row.lenContext).forall(row.segmentIds(_) == 0)) :| "ctx segment"
      )
    }
}
