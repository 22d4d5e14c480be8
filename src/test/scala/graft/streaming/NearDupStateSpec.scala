package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.StreamDedup.{BandRow, Keeper}

/** Direct state-machine tests of [[StreamDedup.updateBand]] via
  * TestGroupState — band patterns that are awkward to force through text
  * fixtures are crafted as raw signatures. */
class NearDupStateSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def state(initial: Option[Keeper]) = TestGroupState.create[Keeper](
    org.apache.spark.api.java.Optional.ofNullable(initial.orNull),
    GroupStateTimeout.EventTimeTimeout, 1000L,
    org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)), false)

  private def row(docId: Long, sim: Long, sec: Long) =
    BandRow(docId, new java.sql.Timestamp(sec * 1000), sim, 1, 42L)

  test("a doc near an earlier NON-first arrival is caught (bounded signature list)") {
    // band 1 (bits 16..31) identical across all three; A far from B overall,
    // C one bit from B — the first-writer-only state would verify C against
    // A alone and falsely keep it
    val simA = 0x00000000ffff0000L // band1 slice 0xffff, 16 other bits set
    val simB = 0xffff0000ffff0000L // same band1 slice, far from A (16 bits)
    val simC = simB ^ 1L           // hamming(B, C) = 1
    val st = state(None)
    val out = StreamDedup.updateBand(3600000L)((1, 42L),
      Iterator(row(1, simA, 0), row(2, simB, 1), row(3, simC, 2)), st).toList
    assert(out.map(_.hamming) === List(-1, 16, 1),
      "C must verify against B's stored signature, not only first-writer A")
    assert(st.get.sims === List(simA, simB, simC))
  }

  test("the signature list is bounded at SigCap; duplicates are not re-stored") {
    val base = 0x0123456789ab0000L
    val st = state(Some(Keeper(List(base), 0L)))
    // 2×SigCap distinct far signatures sharing band 1: only the first
    // SigCap-1 join the stored list
    val rows = (1 to 2 * StreamDedup.SigCap).map { i =>
      row(10L + i, base ^ (0xf00000000L * i), i.toLong)
    }
    StreamDedup.updateBand(3600000L)((1, 42L), rows.iterator, st).toList
    assert(st.get.sims.length === StreamDedup.SigCap)
    // an exact re-arrival (hamming 0) never grows the list
    val st2 = state(Some(Keeper(List(base), 0L)))
    val out2 = StreamDedup.updateBand(3600000L)((1, 42L),
      Iterator(row(99, base, 5)), st2).toList
    assert(out2.map(_.hamming) === List(0) && st2.get.sims === List(base))
  }

  test("timeout with no rows removes the band state") {
    val st = TestGroupState.create[Keeper](
      org.apache.spark.api.java.Optional.of(Keeper(List(7L), 0L)),
      GroupStateTimeout.EventTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(999999999L)), true)
    val out = StreamDedup.updateBand(3600000L)((1, 42L), Iterator.empty, st).toList
    assert(out.isEmpty && st.isRemoved)
  }
}
