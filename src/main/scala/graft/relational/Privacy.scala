package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy release primitives: Laplace-noised counts and
  * sums for publishing grouped aggregates of a 100-TB corpus without
  * exposing individuals — the release-side complement of the
  * suppression-side k-anonymity / l-diversity checks in
  * [[Analytics.kAnonymity]].
  *
  * Noise is DETERMINISTIC: the Laplace draw is inverse-CDF over an
  * md5-uniform of (release tag, group key), the repo's standard
  * engine-portable randomness (same contract as stratifiedSample's
  * md5 rank — `('0x' || substr(md5(k),1,15))::BIGINT / 2^60` replays it
  * in any engine). Determinism is also the DP-correct choice here: one
  * fixed draw per (tag, group) means re-running a release never spends
  * extra privacy budget, while a fresh tag is a new release that does.
  *
  * Shape: ONE corpus aggregate per release (map-side combined); the
  * noise expression runs on the group relation. No extra shuffle, no
  * driver state, no RNG coordination across executors.
  */
object Privacy {

  /** 2^60, the scale of the 60-bit md5 prefix. */
  private val Scale60 = math.pow(2.0, 60)

  /** Uniform in [0,1) from the top 60 bits of md5(tag:key). */
  private def uniform(tag: String, key: Column): Column =
    graft.functions.GraftFunctions.md5_hash60(
      concat_ws(":", lit(tag), key.cast("string"))) / lit(Scale60)

  /** Laplace(0, b) by inverse CDF of u ∈ [0,1):
    * −b·sign(u−½)·ln(1−2·|u−½|). u is clamped away from the endpoints
    * (u=½ exactly gives 0; u→1 would give ∞ — the 60-bit grid makes
    * either measure-zero, the clamp makes them impossible). */
  private def laplace(u: Column, b: Double): Column = {
    val c = least(greatest(u, lit(1e-18)), lit(1.0 - 1e-15))
    val d = c - lit(0.5)
    -lit(b) * signum(d) * log(lit(1.0) - lit(2.0) * abs(d))
  }

  /** ε-DP noisy group counts: (groupCols…, n_noisy) with Laplace(1/ε)
    * noise on each count (sensitivity 1 when each individual contributes
    * one row per group). The true count column is intentionally NOT
    * returned — a release frame carrying both would be no release at
    * all. `tag` names the release; reusing a tag replays the identical
    * noise (no extra ε spent), a new tag is a new draw. Output rounded
    * 6 dp (ln() is the one libm call). */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      tag: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    require(groupCols.nonEmpty, "dpCounts needs >= 1 group column")
    val key = concat_ws("", groupCols.map(c => col(c).cast("string")): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("n_noisy", round(
        col("__n") + laplace(uniform(tag, key), 1.0 / epsilon), 6))
      .drop("__n")
  }

  /** ε-DP noisy group sums of a value clipped to [lo, hi]: clipping
    * bounds each individual's contribution, so Laplace scale is
    * (hi−lo)/ε (one row per individual per group). Clipping happens
    * per-row BEFORE the aggregate — the released sum is the sum of
    * clipped values plus noise, the standard bounded-sum mechanism.
    * Output: (groupCols…, sum_noisy) rounded 6 dp. */
  def dpSums(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, epsilon: Double, tag: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val key = concat_ws("", groupCols.map(c => col(c).cast("string")): _*)
    // quantize the clipped value to integer cents per row so the group
    // sum is an EXACT integer (immune to float summation order on 1000
    // executors); the only inexact steps left are the final cents->units
    // division and the noise ln(), both covered by the 6-dp rounding
    val clippedCents = floor(least(greatest(col(valueCol).cast("double"),
      lit(lo)), lit(hi)) * lit(100)).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(clippedCents).as("__s"))
      .withColumn("sum_noisy", round(col("__s") / lit(100.0) +
        laplace(uniform(tag, key), (hi - lo) / epsilon), 6))
      .drop("__s")
  }
}
