package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A5/O5 — the reference training loop's scalar bookkeeping (run_qa.py:211,
  * 224, 285-306) re-expressed as a declarative DataFrame operator.
  *
  * The reference tracks, per epoch: the running best dev F1 (init 0,
  * run_qa.py:211), a patience counter `torrence_std` that resets to 0 on a
  * STRICT improvement (`tmp_dev_f1 > dev_best_f1`, :285-291) and increments
  * otherwise (:300-302), a best-checkpoint export at every improvement
  * (:294-299), and a `break` once `torrence_std > config.torrence`
  * (:305-306; default patience 5, run_qa.py:65). Epochs after the break
  * never run.
  *
  * Scale shape: the per-run history is tiny (≤ max epochs), but a
  * hyperparameter sweep has MANY runs — so everything is windowed
  * `partitionBy(run)` and the operator early-stops thousands of runs in one
  * pass with a single shuffle on the run key. No collect, no driver loop.
  */
object TrainLoop {

  /** Per-epoch early-stopping ledger over `(run, epoch, devF1)` rows.
    *
    * Returns only epochs that actually execute (epoch ≤ the breaking epoch),
    * each with: `best_f1` (running best AFTER this epoch's update, floored
    * at the reference's init 0), `improved` (1 when this epoch exports a
    * checkpoint), and `torrence_std` (the counter value AFTER this epoch).
    * Epoch numbering may be arbitrary — ordering is what matters (epochs
    * must be unique per run, as in the reference's one-F1-per-epoch loop;
    * duplicate epoch keys would make the row ordering nondeterministic); the
    * counter is computed over row positions, faithful to the loop. A null
    * F1 counts as "no improvement" (the running best and the patience
    * counter advance past it), so a failed eval epoch cannot poison the
    * ledger with null flags.
    */
  def earlyStop(
      history: DataFrame,
      patience: Int = 5,
      runCol: String = "run_id",
      epochCol: String = "epoch",
      f1Col: String = "dev_f1"
  ): DataFrame = {
    val byRun = Window.partitionBy(runCol).orderBy(epochCol)
    val prefix = byRun.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val strictPrefix = byRun.rowsBetween(Window.unboundedPreceding, -1)
    val wholeRun = Window.partitionBy(runCol)

    history
      .withColumn("rn", row_number().over(byRun))
      // strict improvement over the running best, best initialized to 0 —
      // the floor applies to EVERY comparison, not just the empty prefix
      // (an all-negative history must never "improve": the reference's best
      // starts at 0, run_qa.py:211); null F1 (failed eval) coalesces to
      // "not improved", never a null flag
      .withColumn("improved",
        coalesce(
          (col(f1Col) > greatest(
            coalesce(max(col(f1Col)).over(strictPrefix), lit(0.0)), lit(0.0))).cast("int"),
          lit(0)))
      .withColumn("best_f1", greatest(max(col(f1Col)).over(prefix), lit(0.0)))
      .withColumn("torrence_std",
        (col("rn") - coalesce(max(when(col("improved") === 1, col("rn"))).over(prefix), lit(0)))
          .cast("int"))
      // the loop breaks AFTER the first epoch whose counter exceeds patience
      .withColumn("stop_rn",
        min(when(col("torrence_std") > patience, col("rn"))).over(wholeRun))
      .filter(col("rn") <= coalesce(col("stop_rn"), lit(Int.MaxValue)))
      .select(col(runCol), col(epochCol), col(f1Col),
        col("best_f1"), col("torrence_std"), col("improved"))
  }

  /** Per-run summary: the epoch whose checkpoint the reference loads for the
    * final test pass (the LAST improving epoch before the break — each
    * improvement overwrites `pytorch_model.pt`, run_qa.py:294-299/327-331),
    * its F1, and how many epochs actually ran. Runs that never improve have
    * a null `best_epoch` (the reference falls back to the current model,
    * run_qa.py:332-337). */
  def bestCheckpoint(
      history: DataFrame,
      patience: Int = 5,
      runCol: String = "run_id",
      epochCol: String = "epoch",
      f1Col: String = "dev_f1"
  ): DataFrame =
    earlyStop(history, patience, runCol, epochCol, f1Col)
      .groupBy(col(runCol))
      .agg(
        max(when(col("improved") === 1, col(epochCol))).as("best_epoch"),
        max(col("best_f1")).as("best_f1"),
        count(lit(1)).cast("int").as("epochs_run"))
}
