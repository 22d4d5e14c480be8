package graft

import graft.eval.TrainLoop

/** A5/O5 — the windowed early-stop operator vs a direct imperative
  * simulation of the reference loop (run_qa.py:211/224/285-306). */
class TrainLoopSpec extends SparkSpec {

  /** The reference loop, literally: returns per-executed-epoch
    * (epoch, f1, bestAfter, counterAfter, improved) and stops AFTER the
    * first epoch whose counter exceeds patience. */
  private def simulate(f1s: Seq[Double], patience: Int): Seq[(Int, Double, Double, Int, Int)] = {
    var best = 0.0
    var torr = 0
    val out = Seq.newBuilder[(Int, Double, Double, Int, Int)]
    var i = 0
    var stopped = false
    while (i < f1s.length && !stopped) {
      val f1 = f1s(i)
      val improved = f1 > best
      if (improved) { best = f1; torr = 0 } else torr += 1
      out += ((i + 1, f1, best, torr, if (improved) 1 else 0))
      if (torr > patience) stopped = true
      i += 1
    }
    out.result()
  }

  private def run(f1s: Seq[Double], patience: Int) = {
    import spark.implicits._
    val hist = f1s.zipWithIndex
      .map { case (f1, i) => (7L, (i + 1).toLong, f1) }
      .toDF("run_id", "epoch", "dev_f1")
    TrainLoop.earlyStop(hist, patience)
      .orderBy("epoch")
      .collect()
      .map(r => (r.getLong(1).toInt, r.getDouble(2), r.getDouble(3), r.getInt(4), r.getInt(5)))
      .toSeq
  }

  test("operator matches the imperative loop on mixed trajectories") {
    val cases = Seq(
      Seq(0.1, 0.2, 0.15, 0.25, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.9), // stops mid-plateau, late spike never runs
      Seq(0.5, 0.6, 0.7, 0.8, 0.9), // monotone: never stops
      Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.9), // never improves (0 > 0 is false)
      Seq(0.3), // single epoch
      Seq(0.4, 0.4, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5) // tie is NOT improvement
    )
    cases.foreach { f1s =>
      assert(run(f1s, patience = 3) === simulate(f1s, patience = 3), s"history $f1s")
      assert(run(f1s, patience = 0) === simulate(f1s, patience = 0), s"patience 0, $f1s")
    }
  }

  test("runs are independent: two interleaved runs early-stop separately") {
    import spark.implicits._
    val a = Seq(0.9, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1) // stops after epoch 6 (patience 4)
    val b = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7) // never stops
    val hist = (a.zipWithIndex.map { case (f, i) => (1L, (i + 1).toLong, f) } ++
      b.zipWithIndex.map { case (f, i) => (2L, (i + 1).toLong, f) })
      .toDF("run_id", "epoch", "dev_f1").repartition(8)
    val got = TrainLoop.earlyStop(hist, patience = 4)
      .groupBy("run_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 6L, 2L -> 7L))
  }

  test("negative metric values never improve: the best-init-0 floor applies to EVERY epoch") {
    import spark.implicits._
    // the operator is generic over the metric column; a loss-like negative
    // series must behave as the reference loop does (best starts at 0, so
    // nothing below 0 ever exports a checkpoint — run_qa.py:211/285-291)
    val f1s = Seq(-0.5, -0.3, -0.1, -0.05, -0.01)
    assert(run(f1s, patience = 3) === simulate(f1s, patience = 3))
    val hist = f1s.zipWithIndex.map { case (f, i) => (1L, (i + 1).toLong, f) }
      .toDF("run_id", "epoch", "dev_f1")
    val best = TrainLoop.bestCheckpoint(hist, patience = 3).collect()
    assert(best.length === 1 && best(0).isNullAt(1),
      "a never-above-zero run must export no checkpoint")
  }

  test("null F1 epochs (failed evals) count as no-improvement, never emit null flags") {
    import spark.implicits._
    // epochs 2 and 3 have null F1: best stays 0.5, counter advances, and the
    // run stops after the patience-1 window closes at epoch 4
    val hist = Seq(
      (1L, 1L, Some(0.5)), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some(0.4))
    ).toDF("run_id", "epoch", "dev_f1")
    val rows = TrainLoop.earlyStop(hist, patience = 1).orderBy("epoch").collect()
    assert(rows.length === 3) // counter hits 2 > 1 at epoch 3 → epoch 4 never runs
    assert(rows.forall(r => !r.isNullAt(5)), "improved flag must never be null")
    assert(rows.map(_.getInt(5)).toSeq === Seq(1, 0, 0))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.5, 0.5, 0.5)) // best sticks
    assert(rows.map(_.getInt(4)).toSeq === Seq(0, 1, 2))
  }

  test("bestCheckpoint: last improving epoch wins; never-improving run yields null") {
    import spark.implicits._
    val hist = (Seq(0.5, 0.7, 0.6, 0.7, 0.8).zipWithIndex.map { case (f, i) => (1L, (i + 1).toLong, f) } ++
      Seq(0.0, 0.0, 0.0).zipWithIndex.map { case (f, i) => (2L, (i + 1).toLong, f) })
      .toDF("run_id", "epoch", "dev_f1")
    val rows = TrainLoop.bestCheckpoint(hist, patience = 5).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getDouble(2), r.getInt(3)))
      .toMap
    assert(rows(1L) === ((Some(5L), 0.8, 5)))
    // run 2 never improves past the init 0 ⇒ no checkpoint exported
    // (the reference then evaluates the current model, run_qa.py:332-337)
    assert(rows(2L) === ((None, 0.0, 3)))
  }
}
