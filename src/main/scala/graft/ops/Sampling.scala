package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data curation — the
  * "rebalance the corpus by language/source/quality-bucket" step every
  * web-scale pipeline runs before training.
  *
  * The mechanism is a content-hash Bernoulli gate, NOT an RNG: a row is kept
  * iff `md5(key:salt)` falls below the stratum's threshold slice of the
  * 128-bit hash space. That buys three properties `DataFrame.sampleBy`
  * (seeded RNG per partition) cannot give at cluster scale:
  *
  *  - **Stability**: the same row always gets the same verdict — across
  *    re-runs, task retries, repartitioning, and cluster sizes. A retried
  *    task cannot silently change the sample.
  *  - **Zero shuffles**: the gate is a map-side codegen'd filter; sampling a
  *    100 TB corpus costs one scan, no exchange, no per-stratum pass.
  *  - **Composability**: fractions nest — a 0.5 sample contains every row of
  *    a later 0.25 sample with the same salt (thresholds are prefixes of the
  *    same ordering), so staged down-sampling never re-rolls the dice.
  *
  * Sample sizes are binomial around `fraction × stratumCount` (a hash
  * sample, not an exact-size one); for exact-size stratified picks use the
  * md5-ordered `row_number` pattern (`o2_deterministic_downsample`), which
  * costs a shuffle per stratum.
  */
object Sampling {

  /** Lower-case 32-hex-digit threshold covering `fraction` of the md5
    * space. fraction 1.0 returns "g" — lexicographically above every hex
    * digest (digits 0-9a-f), so the gate keeps all rows; 0.0 returns all
    * zeros, below every digest, keeping none. */
  private[ops] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    if (fraction >= 1.0) "g"
    else {
      // UNLIMITED context: the default DECIMAL128 (34 sig digits) rounds a
      // 39-digit 2^128-scale product and corrupts the threshold
      val mc = java.math.MathContext.UNLIMITED
      val scaled = (BigDecimal(fraction, mc) * BigDecimal(BigInt(1) << 128, mc)).toBigInt
      val hex = scaled.toString(16)
      "0" * (32 - hex.length) + hex
    }
  }

  /** The gate column: true iff the row survives its stratum's slice.
    * Strata absent from `fractions` yield null → filter drops them (an
    * unlisted stratum is sampled at 0 — the curation default: you keep what
    * you asked for). */
  private def keepGate(stratumCol: Column, keyCol: Column,
      fractions: Map[String, Double], salt: String): Column = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("string")) { case (acc, (stratum, f)) =>
        when(stratumCol === stratum, lit(hexThreshold(f))).otherwise(acc)
      }
    // concat (not concat_ws): a null key must null the digest and drop the
    // row — concat_ws would silently skip the null and hash the salt alone
    md5(concat(keyCol.cast("string"), lit(":" + salt))) < threshold
  }

  /** Stratified Bernoulli sample: keep ≈`fractions(stratum)` of each
    * stratum, decided by `md5(key:salt)` — deterministic, shuffle-free,
    * stable under retries and repartitioning. Rows with a null key or a
    * stratum not in `fractions` are dropped. */
  def hashStratified(df: DataFrame, stratumCol: String, keyCol: String,
      fractions: Map[String, Double], salt: String = "graft"): DataFrame =
    df.filter(keepGate(col(stratumCol), col(keyCol), fractions, salt))
}
