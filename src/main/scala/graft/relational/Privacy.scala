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

  /** Cumulative 60-bit-integer thresholds for a TRUNCATED two-sided
    * geometric noise draw with decay `p`, outcome order 0, +1, −1, +2,
    * −2, …, ±maxNoise: entry j is (floor(CDF_j · 2⁶⁰), k_j). The draw
    * from a 60-bit md5 uniform u is "first j with u < threshold_j, else
    * the last outcome" — a PURE INTEGER comparison cascade, so the
    * set-defining decision replays bit-for-bit in any engine (the
    * thresholds are computed ONCE on the driver and embedded as long
    * literals in both the Catalyst plan and the oracle SQL — no libm
    * call ever runs engine-side). Shared by [[dpQuantiles]] and its
    * generated oracle. */
  def geometricThresholds(p: Double, maxNoise: Int): Seq[(Long, Int)] = {
    require(p > 0 && p < 1, s"decay p must be in (0,1), got $p")
    require(maxNoise >= 1 && maxNoise <= 60,
      s"maxNoise must be in [1,60], got $maxNoise")
    val p0 = (1 - p) / (1 + p)
    val ks = 0 +: (1 to maxNoise).flatMap(k => Seq(k, -k))
    var cum = 0.0
    ks.map { k =>
      cum += p0 * math.pow(p, math.abs(k))
      (math.floor(cum * Scale60).toLong, k)
    }
  }

  /** The noise cascade as a Column over a 60-bit uniform. */
  private[graft] def geometricNoise(u60: Column, p: Double,
      maxNoise: Int): Column = {
    val ts = geometricThresholds(p, maxNoise)
    val init: Column = lit(ts.last._2)
    ts.init.reverse.foldLeft(init) { case (rest, (t, k)) =>
      when(u60 < lit(t), lit(k)).otherwise(rest)
    }
  }

  /** DP quantile release via discrete report-noisy-max over binned
    * candidates (the exponential-mechanism analog with TWO-SIDED
    * GEOMETRIC noise, McSherry-Talwar 2007 / the geometric mechanism of
    * Ghosh-Roughgarden-Sundararajan 2009): the value domain [lo, hi) is
    * split into `bins` equal bins; candidate outputs are the bin edges
    * e_i = lo + i·(hi−lo)/bins, i = 1..bins; utility
    * u_i = −|#(v < e_i) − floor(q·n)| (sensitivity 1); each candidate's
    * score is u_i plus a truncated two-sided geometric draw with decay
    * `p`, and the argmax edge (tie → smaller i) is released per
    * quantile. Privacy: report-noisy-max with Geom(p) noise on a
    * sensitivity-1 utility satisfies ε-DP with ε = 2·ln(1/p) (p = 0.5 →
    * ε ≈ 1.386); truncation at ±maxNoise perturbs each outcome
    * probability by < p^maxNoise (≈ 6·10⁻⁸ at the 24 default) — the
    * released distribution is that of an (ε, δ≈p^maxNoise)-DP mechanism.
    *
    * Determinism (the dpCounts contract): the draw is an integer
    * threshold cascade over md5(tag:qi:i) — every set-defining decision
    * is INTEGER arithmetic, replayed exactly by the generated oracle;
    * re-running a release replays identical noise (no extra budget), a
    * new tag is a new release.
    *
    * Shape at 100 TB: ONE corpus aggregate (clipped bin counts,
    * map-side combined); everything after runs on ≤`bins` rows — the
    * cumulative is a bins-bounded window, the per-quantile scoring is a
    * broadcast cross join of bins×|qs| rows, the argmax a bins-bounded
    * partitioned window. Output: (q, value_released) rounded 6 dp. */
  def dpQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      lo: Double, hi: Double, bins: Int, tag: String,
      p: Double = 0.5, maxNoise: Int = 24): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bins >= 2 && bins <= 65536,
      s"bins must be in [2, 65536], got $bins")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      s"quantiles must be in (0,1), got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val w = hi - lo
    val v = col(valueCol).cast("double")
    val bc = df.filter(v.isNotNull && !isnan(v))
      .select(least(greatest(
          floor((v - lit(lo)) / lit(w) * lit(bins.toDouble)), lit(0.0)),
        lit(bins - 1.0)).cast("long").as("__idx"))
      .groupBy("__idx").agg(count(lit(1)).as("__cnt"))
    val edges = spark.range(1, bins + 1).select(col("id").as("__i"))
    val cum = edges.join(bc, edges("__i") - 1 === bc("__idx"), "left")
      .select(col("__i"), coalesce(col("__cnt"), lit(0L)).as("__cnt"))
      .withColumn("__cum", sum("__cnt").over(
        graft.util.BoundedWindow.global(col("__i"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
    // coalesce: an empty/all-null input must release the noise-elected
    // edge from all-zero counts (the oracle coalesces its total to 0),
    // not degenerate to edge 1 via NULL scores (ADVICE r9)
    val total = bc.agg(coalesce(sum("__cnt"), lit(0L)).as("__n"))
    val qdf = qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("__qi", "__q")
    val u60 = graft.functions.GraftFunctions.md5_hash60(concat_ws(":",
      lit(tag), col("__qi").cast("string"), col("__i").cast("string")))
    val scored = cum.crossJoin(broadcast(qdf)).crossJoin(broadcast(total))
      .withColumn("__score",
        -abs(col("__cum") - floor(col("__q") * col("__n")).cast("long")) +
          geometricNoise(u60, p, maxNoise).cast("long"))
    // bins-bounded per-quantile argmax, tie to the smaller edge
    val pick = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qi")).orderBy(col("__score").desc, col("__i"))
    scored.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col("__q").as("q"),
        round(lit(lo) + col("__i").cast("double") * lit(w) /
          lit(bins.toDouble), 6).as("value_released"))
  }

  /** Per-group [[dpQuantiles]]: the same discrete noisy-max mechanism
    * released independently for every group (the realistic production
    * release — per-cohort percentiles). The noise key extends to
    * (tag, group key, quantile, candidate), so each group's release is
    * its own deterministic draw; parallel composition applies (disjoint
    * groups — each individual's privacy loss stays the single-release
    * ε = 2·ln(1/p)).
    *
    * Shape at 100 TB: ONE corpus aggregate (per-(group, bin) counts);
    * candidates come from fanning each group through a BROADCAST
    * bins-row edge relation (never a group×group cartesian), the
    * cumulative/total are per-group windows bounded by `bins` rows per
    * partition, and the argmax a (group, q)-partitioned window at the
    * same bound. Output: (groupCols…, q, value_released). */
  def dpQuantilesBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double], lo: Double, hi: Double,
      bins: Int, tag: String, p: Double = 0.5, maxNoise: Int = 24)
      : DataFrame = {
    require(groupCols.nonEmpty, "dpQuantilesBy needs >= 1 group column")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bins >= 2 && bins <= 65536,
      s"bins must be in [2, 65536], got $bins")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      s"quantiles must be in (0,1), got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = hi - lo
    val v = col(valueCol).cast("double")
    val gcols = groupCols.map(col)
    val bc = df.filter(v.isNotNull && !isnan(v))
      .select(gcols :+ least(greatest(
          floor((v - lit(lo)) / lit(w) * lit(bins.toDouble)), lit(0.0)),
        lit(bins - 1.0)).cast("long").as("__idx"): _*)
      .groupBy(gcols :+ col("__idx"): _*)
      .agg(count(lit(1)).as("__cnt"))
    // each group fans through the broadcast bins-row edge relation —
    // empty bins must still be candidates (noise can elect them)
    val edges = spark.range(1, bins + 1).select(col("id").as("__i"))
    val bcr = bc.toDF(bc.columns.map(c =>
      if (groupCols.contains(c)) "__g_" + c else c): _*)
    // null-safe equality (ADVICE r9): with ===, a null-keyed group's bin
    // counts never match and that group would be released from all-zero
    // counts — pure noise instead of its real quantiles (the oracle SQL
    // uses IS NOT DISTINCT FROM for the same reason)
    val cond = groupCols.map(c => col(c) <=> col("__g_" + c))
      .reduce(_ && _) && (col("__bidx") === col("__i") - 1)
    val joined = bc.select(gcols: _*).distinct()
      .crossJoin(broadcast(edges))
      .join(bcr.withColumnRenamed("__idx", "__bidx"), cond, "left")
      .select(gcols :+ col("__i") :+
        coalesce(col("__cnt"), lit(0L)).as("__cnt"): _*)
    val wg = Window.partitionBy(gcols: _*)
    val cum = joined
      .withColumn("__cum", sum("__cnt").over(wg.orderBy(col("__i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__cnt").over(wg))
    val qdf = qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("__qi", "__q")
    // noise key: tag + each group value's string form (null renders as
    // '' — a null group and an ''-keyed group share a noise stream,
    // which only correlates their draws, never breaks determinism)
    val u60 = graft.functions.GraftFunctions.md5_hash60(concat_ws(":",
      lit(tag) +: groupCols.map(c =>
        coalesce(col(c).cast("string"), lit(""))) :+
        col("__qi").cast("string") :+ col("__i").cast("string"): _*))
    val scored = cum.crossJoin(broadcast(qdf))
      .withColumn("__score",
        -abs(col("__cum") - floor(col("__q") * col("__n")).cast("long")) +
          geometricNoise(u60, p, maxNoise).cast("long"))
    val pick = Window.partitionBy(gcols :+ col("__qi"): _*)
      .orderBy(col("__score").desc, col("__i"))
    scored.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(gcols :+ col("__q").as("q") :+
        round(lit(lo) + col("__i").cast("double") * lit(w) /
          lit(bins.toDouble), 6).as("value_released"): _*)
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
