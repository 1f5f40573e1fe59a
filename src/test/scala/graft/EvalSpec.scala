package graft

import graft.relational.Eval
import org.apache.spark.sql.functions._

/** Golden + randomized tests for the evaluation/monitoring operators:
  * AUC (both paths vs brute-force pair counting), calibration, lift,
  * confusion sweep, Kaplan-Meier, and CUSUM vs the literal sequential
  * recursion. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  // ---- AUC ---------------------------------------------------------------

  private def bruteAuc(rows: Seq[(Double, Long)]): Double = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size)
  }

  test("auc: small and binned paths both equal brute-force pair counting " +
      "on tied random data") {
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(12).toDouble / 12.0, rnd.nextInt(2).toLong))
    val df = rows.toDF("score", "label")
    val expected = BigDecimal(bruteAuc(rows))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (thr <- Seq(100000L, 1L)) {
      val out = Eval.auc(df, "score", "label", maxDistinctBroadcast = thr)
        .collect().head
      assert(math.abs(out.getDouble(0) - expected) < 1e-9,
        s"thr=$thr: ${out.getDouble(0)} vs $expected")
      assert(out.getLong(1) == rows.count(_._2 == 1L))
      assert(out.getLong(2) == rows.count(_._2 == 0L))
    }
  }

  test("auc: perfect separation is 1.0, inverted is 0.0, null scores " +
      "excluded") {
    val df = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))
      .toDF("score", "label")
    assert(Eval.auc(df, "score", "label").collect().head.getDouble(0)
      == 1.0)
    val inv = df.withColumn("label", lit(1L) - col("label"))
    assert(Eval.auc(inv, "score", "label").collect().head.getDouble(0)
      == 0.0)
    val withNull = df.union(Seq((Double.NaN, 1L)).toDF("s", "l"))
      .withColumn("score", when(isnan(col("score")), lit(null))
        .otherwise(col("score")))
    val r = Eval.auc(withNull, "score", "label").collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
  }

  // ---- PR-AUC / ECE ------------------------------------------------------

  /** Step-integral AP with threshold-grouped ties — the literal sweep
    * prAuc's cumulative formulation must equal. */
  private def bruteAp(rows: Seq[(Double, Long)]): Double = {
    val p = rows.count(_._2 == 1L).toDouble
    val byScore = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var tp = 0.0; var n = 0.0; var ap = 0.0
    byScore.foreach { case (_, g) =>
      val dp = g.count(_._2 == 1L)
      tp += dp; n += g.size
      ap += dp / p * (tp / n)
    }
    ap
  }

  test("prAuc: small and binned paths both equal the literal descending " +
      "threshold sweep; perfect ranking is 1.0") {
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(12).toDouble / 12.0, rnd.nextInt(2).toLong))
    val df = rows.toDF("score", "label")
    val expected = BigDecimal(bruteAp(rows))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (thr <- Seq(100000L, 1L)) {
      val out = Eval.prAuc(df, "score", "label", maxDistinctBroadcast = thr)
        .collect().head
      assert(math.abs(out.getDouble(0) - expected) < 1e-6,
        s"thr=$thr: ${out.getDouble(0)} vs $expected")
    }
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))
      .toDF("score", "label")
    assert(Eval.prAuc(perfect, "score", "label").collect().head
      .getDouble(0) == 1.0)
  }

  test("ece: hand-computed weighted gap; perfectly calibrated bins give 0") {
    // bin 0: conf 0.07, acc 0.5 -> gap 0.43 (n=2); bin 9: conf 0.975,
    // acc 1.0 -> gap 0.025 (n=2); ece = 0.2275
    val df = Seq((0.05, 0L), (0.09, 1L), (0.95, 1L), (1.0, 1L))
      .toDF("score", "label")
    val out = Eval.ece(df, "score", "label", nBins = 10).collect().head
    assert(math.abs(out.getDouble(0) - 0.2275) < 1e-9)
    assert(out.getLong(1) == 4L)
    val calibrated = Seq((0.25, 0L), (0.25, 0L), (0.25, 1L), (0.25, 0L))
      .toDF("score", "label")
    assert(Eval.ece(calibrated, "score", "label", nBins = 10)
      .collect().head.getDouble(0) == 0.0)
  }

  // ---- calibration / lift / confusion ------------------------------------

  test("calibration: bin edges, top-bin inclusion of 1.0, counts and " +
      "pos_rate") {
    val df = Seq((0.05, 0L), (0.09, 1L), (0.95, 1L), (1.0, 1L))
      .toDF("score", "label")
    val out = Eval.calibration(df, "score", "label", nBins = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 9L))
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.5, 1.0))
  }

  test("liftGains: totals add up, gain ends at 1.0, final lift is 1.0, " +
      "gain monotone") {
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(1000).toDouble / 1000.0,
        if (rnd.nextDouble() < 0.3) 1L else 0L))
    val df = rows.toDF("score", "label")
    val out = Eval.liftGains(df, "score", "label", nBuckets = 10)
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(1)).sum == rows.size)
    assert(out.map(_.getLong(2)).sum == rows.count(_._2 == 1L))
    val gains = out.map(_.getDouble(3)).toSeq
    assert(gains == gains.sorted, s"gain not monotone: $gains")
    assert(gains.last == 1.0)
    assert(out.last.getDouble(4) == 1.0) // whole-population lift
  }

  test("confusionSweep: cells partition n at every threshold; metrics " +
      "match direct counts; empty-prediction threshold nulls precision") {
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(100).toDouble / 200.0, rnd.nextInt(2).toLong)) // s<0.5
    val df = rows.toDF("score", "label")
    val out = Eval.confusionSweep(df, "score", "label", Seq(0.2, 0.7))
      .orderBy("threshold").collect()
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)
        == rows.size)
    }
    val t0 = out.head
    val tp = rows.count(r => r._1 >= 0.2 && r._2 == 1L)
    val fp = rows.count(r => r._1 >= 0.2 && r._2 == 0L)
    assert(t0.getLong(1) == tp && t0.getLong(2) == fp)
    assert(math.abs(t0.getDouble(5) - tp.toDouble / (tp + fp)) < 1e-6)
    // no score reaches 0.7: tp=fp=0 -> precision null, recall 0
    val t1 = out.last
    assert(t1.getLong(1) == 0L && t1.getLong(2) == 0L)
    assert(t1.isNullAt(5))
    assert(t1.getDouble(6) == 0.0)
  }

  test("multiclassMetrics: hand-computed per-class table; never-predicted " +
      "and never-actual classes keep guarded nulls") {
    // actual: a,a,b,b,c  pred: a,b,b,b,d
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
      ("c", "d")).toDF("actual", "pred")
    val out = Eval.multiclassMetrics(df, "actual", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    val a = out("a") // tp=1, n_actual=2, n_pred=1
    assert(a.getLong(3) == 1L && a.getDouble(4) == 1.0 &&
      a.getDouble(5) == 0.5)
    assert(math.abs(a.getDouble(6) - 2.0 / 3) < 1e-6)
    val b = out("b") // tp=2, n_actual=2, n_pred=3
    assert(math.abs(b.getDouble(4) - 2.0 / 3) < 1e-6 &&
      b.getDouble(5) == 1.0)
    assert(out("c").getLong(2) == 0L && out("c").isNullAt(4)) // never pred
    assert(out("c").getDouble(5) == 0.0)
    assert(out("d").getLong(1) == 0L && out("d").isNullAt(5)) // never actual
    assert(out("d").getDouble(4) == 0.0)
  }

  // ---- Kaplan-Meier ------------------------------------------------------

  test("kaplanMeier: textbook curve with same-time censoring at risk") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L))
      .toDF("duration", "ev")
    val out = Eval.kaplanMeier(df, "duration", "ev")
      .orderBy("duration").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 4L, 2L, 1L)) // n_risk
    assertColApprox(
      Eval.kaplanMeier(df, "duration", "ev").orderBy("duration"),
      "survival", Seq(Some(0.8), Some(0.6), Some(0.3), Some(0.3)),
      eps = 1e-6)
  }

  test("kaplanMeier: a level that takes every remaining subject drives " +
      "survival to exactly 0 (the ln(0) edge)") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 1L)).toDF("duration", "ev")
    val out = Eval.kaplanMeier(df, "duration", "ev")
      .orderBy("duration").collect()
    assert(math.abs(out.head.getDouble(4) - 1.0 / 3 * 2) < 1e-6)
    assert(out.last.getDouble(4) == 0.0)
  }

  test("twoProportionZ: hand-computed pooled z; equal rates give z=0") {
    // a: 30/100, b: 20/100 -> pool 0.25
    val rows = (1 to 100).map(i => (if (i <= 30) 1L else 0L, "a")) ++
      (1 to 100).map(i => (if (i <= 20) 1L else 0L, "b"))
    val out = Eval.twoProportionZ(rows.toDF("s", "g"), "s", "g", "a", "b")
      .collect().head
    assert(out.getDouble(0) == 0.3 && out.getDouble(1) == 0.2)
    val zExp = 0.1 / math.sqrt(0.25 * 0.75 * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(out.getDouble(3) - zExp) < 1e-6)
    // identical construction in both groups:
    val eq = (1 to 50).map(i => (i % 2L, "a")) ++
      (1 to 50).map(i => (i % 2L, "b"))
    assert(Eval.twoProportionZ(eq.toDF("s", "g"), "s", "g", "a", "b")
      .collect().head.getDouble(3) == 0.0)
  }

  test("wilsonRates: matches the closed form, stays inside [0,1] at the " +
      "extremes, and brackets the rate") {
    val rows = Seq.fill(7)(("g1", 1L)) ++ Seq.fill(3)(("g1", 0L)) ++
      Seq.fill(5)(("g2", 1L)) ++ // all successes
      Seq.fill(4)(("g3", 0L)) // none
    val out = Eval.wilsonRates(rows.toDF("g", "s"), Seq("g"), "s")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    val (n, p, z2) = (10.0, 0.7, 1.96 * 1.96)
    val center = (p + z2 / (2 * n)) / (1 + z2 / n)
    val half = 1.96 * math.sqrt(p * 0.3 / n + z2 / (4 * n * n)) /
      (1 + z2 / n)
    assert(math.abs(g1.getDouble(4) - (center - half)) < 1e-6)
    assert(math.abs(g1.getDouble(5) - (center + half)) < 1e-6)
    assert(g1.getDouble(4) < 0.7 && g1.getDouble(5) > 0.7)
    assert(out("g2").getDouble(3) == 1.0 && out("g2").getDouble(5) <= 1.0)
    assert(out("g3").getDouble(3) == 0.0 && out("g3").getDouble(4) >= 0.0)
  }

  test("seasonality: a flat series indexes 1.0 everywhere; a spiked dow " +
      "indexes above 1 exactly") {
    import graft.relational.Analytics
    val flat = (0L until 28L).map(d => ("k", d, 10L)).toDF("k", "day", "v")
    val f = Analytics.seasonality(flat, Seq("k"), "day", "v").collect()
    assert(f.length == 7 && f.forall(_.getDouble(4) == 1.0))
    // dow 0 doubled: overall mean = (2*4 + 6*1*4)/28 * 10 ... compute:
    val spiked = (0L until 28L).map(d =>
      ("k", d, if (d % 7 == 0) 20L else 10L)).toDF("k", "day", "v")
    val sp = Analytics.seasonality(spiked, Seq("k"), "day", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val overall = (20.0 * 4 + 10.0 * 24) / 28
    assert(math.abs(sp(0L) - BigDecimal(20.0 / overall).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(sp(1L) < 1.0)
  }

  // ---- Spearman ----------------------------------------------------------

  test("spearman: monotone transform gives rho=1, reversal -1, and tied " +
      "random data matches the literal midrank Pearson") {
    val mono = (1 to 100).map(i => (i.toDouble, math.exp(i / 10.0)))
      .toDF("a", "b")
    assert(Eval.spearman(mono, "a", "b").collect().head.getDouble(0)
      == 1.0)
    val rev = (1 to 100).map(i => (i.toDouble, -i * 3.0)).toDF("a", "b")
    assert(Eval.spearman(rev, "a", "b").collect().head.getDouble(0)
      == -1.0)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble))
    def midranks(xs: Seq[Double]): Map[Double, Double] = {
      val below = scala.collection.mutable.Map[Double, Long]()
      val counts = xs.groupBy(identity).view.mapValues(_.size.toLong)
      var cum = 0L
      counts.toSeq.sortBy(_._1).foreach { case (v, c) =>
        below(v) = cum; cum += c
      }
      counts.map { case (v, c) => v -> (below(v) + (c + 1) / 2.0) }.toMap
    }
    val ma = midranks(rows.map(_._1)); val mb = midranks(rows.map(_._2))
    val ranked = rows.map { case (a, b) => (ma(a), mb(b)) }
    val n = ranked.size.toDouble
    val (xa, xb) = (ranked.map(_._1), ranked.map(_._2))
    val (mA, mB) = (xa.sum / n, xb.sum / n)
    val cov = ranked.map { case (x, y) => (x - mA) * (y - mB) }.sum
    val expected = cov / math.sqrt(
      xa.map(x => (x - mA) * (x - mA)).sum *
      xb.map(y => (y - mB) * (y - mB)).sum)
    val got = Eval.spearman(rows.toDF("a", "b"), "a", "b")
      .collect().head.getDouble(0)
    assert(math.abs(got - expected) < 1e-6, s"$got vs $expected")
  }

  // ---- A/B tests ---------------------------------------------------------

  test("welchTTest: hand-computed t and Satterthwaite df on a known " +
      "fixture; equal samples give t=0") {
    // a = [1,2,3,4] (mean 2.5, var 5/3), b = [2,4,6,8,10] (mean 6, var 10)
    val df = (Seq(1, 2, 3, 4).map(x => (x.toDouble, "a")) ++
      Seq(2, 4, 6, 8, 10).map(x => (x.toDouble, "b"))).toDF("v", "g")
    val out = Eval.welchTTest(df, "v", "g", "a", "b").collect().head
    val sa = (5.0 / 3) / 4; val sb = 10.0 / 5
    val tExp = (2.5 - 6.0) / math.sqrt(sa + sb)
    val dfExp = math.pow(sa + sb, 2) / (sa * sa / 3 + sb * sb / 4)
    assert(math.abs(out.getDouble(0) - tExp) < 1e-6)
    assert(math.abs(out.getDouble(1) - dfExp) < 1e-6)
    assert(out.getLong(4) == 4L && out.getLong(5) == 5L)
    val same = (Seq(1.0, 2.0, 3.0).map((_, "a")) ++
      Seq(1.0, 2.0, 3.0).map((_, "b"))).toDF("v", "g")
    assert(Eval.welchTTest(same, "v", "g", "a", "b")
      .collect().head.getDouble(0) == 0.0)
  }

  test("rankSumTest: U/z match the literal rank-sum computation with " +
      "tie correction; identical distributions give z near 0") {
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(8).toDouble, rnd.nextInt(2).toLong))
    val df = rows.toDF("score", "label")
    val out = Eval.rankSumTest(df, "score", "label").collect().head
    val p = rows.count(_._2 == 1L).toDouble
    val q = rows.size - p
    val uExp = bruteAuc(rows) * p * q
    assert(math.abs(out.getDouble(0) - uExp) < 1e-6)
    val n = p + q
    val ties = rows.groupBy(_._1).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val sigma = math.sqrt(p * q / 12.0 * ((n + 1) - ties / (n * (n - 1))))
    val zExp = (uExp - p * q / 2.0) / sigma
    assert(math.abs(out.getDouble(1) - zExp) < 1e-5)
    assert(math.abs(out.getDouble(1)) < 4.0) // same distribution
  }

  // ---- Lorenz / Gini -----------------------------------------------------

  /** Trapezoid Gini over the sorted values — the literal Lorenz curve. */
  private def bruteGini(xs: Seq[Double]): Double = {
    val sorted = xs.sorted
    val n = sorted.size.toDouble
    val total = sorted.sum
    var cum = 0.0; var b = 0.0
    sorted.foreach { x =>
      val prev = cum; cum += x
      b += (1.0 / n) * ((cum + prev) / total)
    }
    1.0 - b
  }

  test("lorenzGini: both paths equal the literal Lorenz integral; " +
      "perfect equality is 0; full concentration tends to 1-1/n") {
    val xs = (1 to 300).map(_ => rnd.nextInt(50).toDouble)
    val df = xs.toDF("v")
    val expected = bruteGini(xs)
    for (thr <- Seq(100000L, 1L)) {
      val g = Eval.lorenzGini(df, "v", maxDistinctBroadcast = thr)
        .collect().head
      assert(math.abs(g.getDouble(0) - expected) < 1e-6, s"thr=$thr")
      assert(g.getLong(1) == 300L)
    }
    assert(Eval.lorenzGini(Seq(5.0, 5.0, 5.0, 5.0).toDF("v"), "v")
      .collect().head.getDouble(0) == 0.0)
    val conc = Eval.lorenzGini(
      (Seq.fill(99)(0.0) :+ 1000.0).toDF("v"), "v").collect().head
    assert(math.abs(conc.getDouble(0) - 0.99) < 1e-6)
  }

  // ---- conformal ---------------------------------------------------------

  test("conformal: qhat is exactly the ceil((n+1)(1-alpha))-th smallest " +
      "calibration residual, and exchangeable data covers >= 1-alpha") {
    val calib = (1 to 500).map(_ => (rnd.nextDouble() * 10, 0.0))
    val test_ = (1 to 500).map(_ => (rnd.nextDouble() * 10, 0.0))
    val alpha = 0.2
    val out = Eval.conformal(calib.toDF("pred", "actual"),
      test_.toDF("pred", "actual"), "pred", "actual", alpha)
      .collect().head
    val k = math.ceil((calib.size + 1) * (1 - alpha)).toInt
    val expectedQ = calib.map(r => math.abs(r._1 - r._2)).sorted.apply(k - 1)
    assert(out.getDouble(0) == expectedQ)
    val cov = out.getDouble(1)
    // finite-sample guarantee: E[coverage] in [1-alpha, 1-alpha+1/(n+1)];
    // one draw at n=500 stays within ±5pp with overwhelming probability
    assert(cov >= 1 - alpha - 0.05 && cov <= 1 - alpha + 0.05, cov)
    assert(out.getLong(2) == 500L && out.getLong(3) == 500L)
  }

  test("conformal: too-small calibration set clamps to the max residual") {
    val calib = Seq((1.0, 0.0), (3.0, 0.0)).toDF("pred", "actual")
    val test_ = Seq((2.0, 0.0)).toDF("pred", "actual")
    // alpha=0.1 wants rank ceil(3*0.9)=3 > n=2 -> clamped to max = 3.0
    val out = Eval.conformal(calib, test_, "pred", "actual", 0.1)
      .collect().head
    assert(out.getDouble(0) == 3.0)
    assert(out.getDouble(1) == 1.0)
  }

  // ---- kappa / fairness / scoring rules ----------------------------------

  test("cohenKappa: hand-computed 2x2 table, perfect agreement is 1, " +
      "degenerate chance agreement is null") {
    // classic: a=yes/no vs b with po=0.7, marginals A(yes)=0.5,
    // B(yes)=0.6 -> pe = 0.5*0.6 + 0.5*0.4 = 0.5, kappa = 0.4
    val rows = Seq.fill(3)(("y", "y")) ++ Seq.fill(2)(("y", "n")) ++
      Seq.fill(1)(("n", "y")) ++ Seq.fill(4)(("n", "n"))
    val out = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(math.abs(out.getDouble(0) - 0.4) < 1e-9)
    assert(out.getDouble(1) == 0.7 && out.getDouble(2) == 0.5)
    assert(out.getLong(3) == 10L)
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(Eval.cohenKappa(perfect, "a", "b").collect().head
      .getDouble(0) == 1.0)
    val constant = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Eval.cohenKappa(constant, "a", "b").collect().head.isNullAt(0))
  }

  test("groupConfusion: rollup total row aggregates the groups; rates " +
      "match direct counts; all-negative group nulls tpr") {
    val rows = (1 to 200).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val lab = if (g == "a") 0L else rnd.nextInt(2).toLong // a: never pos
      (g, rnd.nextInt(100).toDouble / 100.0, lab)
    }
    val df = rows.toDF("g", "score", "label")
    val out = Eval.groupConfusion(df, "score", "label", Seq("g"), 0.5)
      .collect().map(r => Option(r.getString(0)) -> r).toMap
    val total = out(None)
    assert(total.getLong(1) == rows.size)
    assert(out(Some("a")).getLong(1) + out(Some("b")).getLong(1)
      == rows.size)
    Seq(2, 3, 4, 5).foreach(i => // tp/fp/fn/tn add across groups
      assert(out(Some("a")).getLong(i) + out(Some("b")).getLong(i)
        == total.getLong(i)))
    val bTp = rows.count(r => r._1 == "b" && r._2 >= 0.5 && r._3 == 1L)
    val bFn = rows.count(r => r._1 == "b" && r._2 < 0.5 && r._3 == 1L)
    assert(math.abs(out(Some("b")).getDouble(6)
      - bTp.toDouble / (bTp + bFn)) < 1e-6)
    assert(out(Some("a")).isNullAt(6)) // no positives -> tpr null
    assert(out(Some("a")).getDouble(9) == 0.0) // base_rate 0
  }

  test("scoringRules: hand-computed brier/logloss; confident-wrong " +
      "prediction stays finite via the eps clamp") {
    val df = Seq((0.8, 1L), (0.2, 0L)).toDF("score", "label")
    val out = Eval.scoringRules(df, "score", "label").collect().head
    assert(math.abs(out.getDouble(0) - 0.04) < 1e-9) // mean(0.04, 0.04)
    assert(math.abs(out.getDouble(1) - (-math.log(0.8))) < 1e-6)
    val wrong = Seq((0.0, 1L), (1.0, 0L)).toDF("score", "label")
    val w = Eval.scoringRules(wrong, "score", "label", eps = 1e-6)
      .collect().head
    assert(math.abs(w.getDouble(1) - (-math.log(1e-6))) < 1e-3)
    assert(!w.getDouble(1).isInfinite)
  }

  test("kaplanMeier grouped: each segment's curve is independent and " +
      "equals the ungrouped curve over that segment alone") {
    val rows = Seq(("x", 1L, 1L), ("x", 2L, 0L), ("x", 3L, 1L),
      ("y", 1L, 0L), ("y", 2L, 1L), ("y", 2L, 1L))
    val df = rows.toDF("seg", "duration", "ev")
    val grouped = Eval.kaplanMeier(df, "duration", "ev", Seq("seg"))
      .orderBy("seg", "duration").collect()
    Seq("x", "y").foreach { s =>
      val solo = Eval.kaplanMeier(df.filter(col("seg") === s),
        "duration", "ev").orderBy("duration").collect()
      val sub = grouped.filter(_.getString(0) == s)
      assert(sub.map(r => (r.getLong(1), r.getLong(2), r.getDouble(5)))
        .toSeq ==
        solo.map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
          .toSeq, s)
    }
  }

  test("benford: observed shares sum to 1, expected follows log10(1+1/d), " +
      "and a Benford-distributed sample matches closely") {
    // construct values whose leading digits follow Benford counts
    val counts = (1 to 9).map(d =>
      d -> math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt)
    val vals = counts.flatMap { case (d, c) =>
      (1 to c).map(i => d * 100.0 + (i % 90)) } // digit d in the cents
    val out = Eval.benford(vals.toDF("v"), "v")
      .orderBy("digit").collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 9L))
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-6)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) -
        math.log10(1.0 + 1.0 / r.getLong(0))) < 1e-6)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.01,
        s"digit ${r.getLong(0)}")
    }
  }

  // ---- CUSUM -------------------------------------------------------------

  test("cusum: prefix-sum closed form equals the literal sequential " +
      "recursion on random per-key series") {
    val target = 5.0
    val slack = 0.5
    val series = for {
      k <- Seq("a", "b", "c")
      i <- 1 to 50
    } yield (k, i.toLong, rnd.nextInt(12).toDouble)
    val df = series.toDF("k", "t", "x")
    val got = Eval.cusum(df, Seq("k"), "t", "x", target, slack, h = 8.0)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getBoolean(4)))
    val expected = series.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      var s = 0.0
      rows.sortBy(_._2).map { case (_, t, x) =>
        s = math.max(0.0, s + x - target - slack)
        (k, t, s, s > 8.0)
      }
    }.sortBy(r => (r._1, r._2))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"$g vs $e")
      assert(math.abs(g._3 - e._3) < 1e-9, s"$g vs $e")
      assert(g._4 == e._4, s"$g vs $e")
    }
  }

  test("cusum: keeps input columns, exact integral arithmetic, no alarm " +
      "on an in-control series") {
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 10.0), ("k", 3L, 10.0))
      .toDF("k", "t", "x")
    val out = Eval.cusum(df, Seq("k"), "t", "x", target = 10.0,
      slack = 0.0, h = 1.0).orderBy("t").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.0, 0.0, 0.0))
    assert(out.forall(!_.getBoolean(4)))
  }

  // ---- autocorrelation ----------------------------------------------------

  private def bruteAcf(xs: Seq[Double], k: Int): Option[Double] = {
    val n = xs.size
    val m = xs.sum / n
    val den = xs.map(v => (v - m) * (v - m)).sum
    if (den <= 0 || k >= n) None
    else Some((k until n).map(t => (xs(t) - m) * (xs(t - k) - m)).sum / den)
  }

  test("acf: matches the literal full-series-denominator estimator on " +
      "random integer series, lag by lag") {
    val maxLag = 5
    val series = for {
      key <- Seq("a", "b", "c")
      t <- 1 to (20 + rnd.nextInt(30))
    } yield (key, t.toLong, rnd.nextInt(40).toDouble)
    val got = Eval.acf(series.toDF("k", "t", "x"), Seq("k"), "t", "x",
      maxLag).collect()
      .map(r => ((r.getString(0), r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    for (key <- Seq("a", "b", "c"); k <- 1 to maxLag) {
      val xs = series.filter(_._1 == key).sortBy(_._2).map(_._3)
      (got((key, k)), bruteAcf(xs, k)) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 2e-6,
          s"$key lag $k: $g vs $e")
        case (g, e) => assert(g.isEmpty == e.isEmpty, s"$key lag $k")
      }
    }
  }

  test("acf: constant series yields null acf; series shorter than the " +
      "lag yields zero pairs and null acf") {
    val series = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0),
      ("s", 1L, 1.0), ("s", 2L, 2.0))
    val out = Eval.acf(series.toDF("k", "t", "x"), Seq("k"), "t", "x",
      maxLag = 3).collect()
      .map(r => ((r.getString(0), r.getInt(2)),
        (r.isNullAt(3), r.getLong(4)))).toMap
    (1 to 3).foreach(k => assert(out(("c", k))._1)) // zero variance
    assert(out(("s", 2))._2 == 0L && out(("s", 2))._1) // no pairs
    assert(out(("s", 3))._2 == 0L && out(("s", 3))._1)
    assert(!out(("s", 1))._1) // one pair, defined
  }

  test("acf: a strict two-period alternation is negatively correlated " +
      "at lag 1 and maximally correlated at lag 2") {
    val xs = (1 to 40).map(t => ("k", t.toLong,
      if (t % 2 == 0) 10.0 else 0.0))
    val out = Eval.acf(xs.toDF("k", "t", "x"), Seq("k"), "t", "x", 2)
      .collect().map(r => (r.getInt(2), r.getDouble(3))).toMap
    assert(out(1) < -0.9 && out(2) > 0.9)
  }

  // ---- changepoint localization -------------------------------------------

  private def bruteSplit(xs: Seq[Double]): (Int, Double, Double) = {
    def sse(s: Seq[Double]): Double = {
      val m = s.sum / s.size
      s.map(v => (v - m) * (v - m)).sum
    }
    val total = sse(xs)
    val (best, t) = (1 until xs.size)
      .map(t => (sse(xs.take(t)) + sse(xs.drop(t)), t))
      .minBy { case (v, i) => (v, i) }
    (t, total, total - best)
  }

  test("changepoint: finds the literal O(n^2) best split on random " +
      "integer series, with the earliest-cut tie rule") {
    val series = for {
      key <- Seq("a", "b")
      t <- 1 to (15 + rnd.nextInt(20))
    } yield (key, t.toLong, rnd.nextInt(20).toDouble)
    val got = Eval.changepoint(series.toDF("k", "t", "x"),
      Seq("k"), "t", "x").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(5))).toMap
    for (key <- Seq("a", "b")) {
      val xs = series.filter(_._1 == key).sortBy(_._2).map(_._3)
      val (t, _, gain) = bruteSplit(xs)
      assert(got(key)._1 == t.toLong, s"$key: ${got(key)._1} vs $t")
      assert(math.abs(got(key)._2 - gain) < 1e-6, s"$key gain")
    }
  }

  test("changepoint: localizes a planted mean shift exactly and " +
      "explains (almost) all variance; constant series gains ~0; " +
      "single-row series are omitted") {
    val planted = (1 to 60).map(t =>
      ("p", t.toLong, if (t <= 42) 10.0 else 30.0)) ++
      (1 to 10).map(t => ("c", t.toLong, 7.0)) ++
      Seq(("one", 1L, 5.0))
    val out = Eval.changepoint(planted.toDF("k", "t", "x"),
      Seq("k"), "t", "x").collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("p")._1 == 42L)
    assert(out("p")._2 == 0.0) // sse_split: both halves constant
    assert(out("c")._3 == 0.0) // no variance to explain
    assert(!out.contains("one"))
  }

  // ---- ANOVA / Brown-Forsythe --------------------------------------------------

  test("anovaF: matches the literal one-way F on random integer groups; " +
      "identical groups score ~0, shifted groups score large") {
    val rows = (1 to 300).map { i =>
      val g = s"g${i % 3}"
      (g, (rnd.nextInt(20) + (i % 3) * 15).toDouble) // separated means
    }
    val got = Eval.anovaF(rows.toDF("g", "x"), "g", "x").collect()(0)
    val groups = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val n = rows.size
    val k = groups.size
    val grand = rows.map(_._2).sum / n
    val ssb = groups.map(g => g.size * math.pow(
      g.sum / g.size - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.size; g.map(v => (v - m) * (v - m)).sum
    }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(got.getDouble(0) - f) < 1e-4)
    assert(got.getLong(1) == 2L && got.getLong(2) == 297L)
    assert(got.getDouble(0) > 50) // planted separation
    val flat = Eval.anovaF(rows.map(r => (r._1, 5.0)).toDF("g", "x"),
      "g", "x").collect()(0)
    assert(flat.isNullAt(0)) // zero within-variance -> null
  }

  test("brownForsythe: equal-spread groups score low, a planted " +
      "wide-spread group scores high; medians are the exact order stat") {
    val same = (1 to 300).map(i => (s"g${i % 3}", (i % 21).toDouble))
    val lo = Eval.brownForsythe(same.toDF("g", "x"), "g", "x")
      .collect()(0)
    assert(lo.getDouble(0) < 2, s"equal spreads: ${lo.getDouble(0)}")
    val spread = (1 to 300).map { i =>
      val g = s"g${i % 3}"
      val v = if (i % 3 == 0) (i % 81) * 3 else i % 21 // g0 much wider
      (g, v.toDouble)
    }
    val hi = Eval.brownForsythe(spread.toDF("g", "x"), "g", "x")
      .collect()(0)
    assert(hi.getDouble(0) > 20, s"planted spread: ${hi.getDouble(0)}")
  }

  // ---- uplift / Qini -----------------------------------------------------------------

  test("upliftDeciles: matches the literal cumulative qini; a perfectly " +
      "targeted effect bulges early and lands at the true lift") {
    // treatment lifts outcome ONLY where score > 0.7 (the model is right)
    val rows = (1 to 2000).map { i =>
      val score = (i % 100) / 100.0
      val treated = i % 2
      val base = i % 7 == 0 // hits both parities — uncorrelated with t
      val lifted = treated == 1 && score > 0.7 && i % 3 == 0
      (score, treated.toLong, if (base || lifted) 1L else 0L)
    }
    val got = Eval.upliftDeciles(rows.toDF("s", "t", "y"), "s", "t", "y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(5))).toMap
    // literal replay
    val byBucket = rows.groupBy(r =>
      math.min(math.floor((1.0 - r._1) * 10).toLong, 9L))
    var (cnt, cnc, cyt, cyc) = (0L, 0L, 0L, 0L)
    (0L to 9L).foreach { b =>
      val v = byBucket.getOrElse(b, Seq())
      cnt += v.count(_._2 == 1); cnc += v.count(_._2 == 0)
      cyt += v.filter(_._2 == 1).map(_._3).sum
      cyc += v.filter(_._2 == 0).map(_._3).sum
      val qini = cyt - cyc * (cnt.toDouble / cnc)
      assert(math.abs(got(b)._3 - qini) < 1e-4, s"bucket $b")
    }
    // early buckets (top scores) carry most of the final uplift
    assert(got(2L)._3 > 0.75 * got(9L)._3)
    assert(got(9L)._3 > 50) // the planted effect exists
  }

  // ---- McNemar paired comparison ----------------------------------------------------

  test("mcNemar: textbook discordant-pair z with continuity correction; " +
      "identical models yield null; sign follows the better model") {
    // b = 30 (A right, B wrong), c = 10 -> A better, z > 0
    val rows =
      (1 to 30).map(i => (1L, 1L, 0L)) ++ // A right, B wrong
      (1 to 10).map(i => (1L, 0L, 1L)) ++ // A wrong, B right
      (1 to 50).map(i => (1L, 1L, 1L)) ++ // both right
      (1 to 10).map(i => (0L, 1L, 1L)) // both wrong
    val r = Eval.mcNemar(rows.toDF("y", "a", "b"), "y", "a", "b")
      .collect()(0)
    assert(r.getLong(1) == 30L && r.getLong(2) == 10L)
    val z = (30.0 - 10 - 1) / math.sqrt(40.0) // +: A better
    assert(math.abs(r.getDouble(3) - z) < 1e-6)
    assert(r.getDouble(4) < 0.01) // significant
    assert(r.getDouble(5) == 0.8 && r.getDouble(6) == 0.6)
    val same = Eval.mcNemar(rows.map(t => (t._1, t._2, t._2))
      .toDF("y", "a", "b"), "y", "a", "b").collect()(0)
    assert(same.isNullAt(3) && same.isNullAt(4))
  }

  // ---- Mann-Kendall trend ---------------------------------------------------------

  test("mannKendall: S, tie-corrected variance and z match the literal " +
      "pairwise computation; monotone is strong, constant is null") {
    val series = for (k <- Seq("a", "b"); t <- 1 to 30)
      yield (k, t.toLong, rnd.nextInt(12).toDouble)
    val mono = (1 to 30).map(t => ("m", t.toLong, t * 2.0))
    val const = (1 to 10).map(t => ("c", t.toLong, 5.0))
    val got = Eval.mannKendall((series ++ mono ++ const)
      .toDF("k", "t", "x"), Seq("k"), "t", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    for (key <- Seq("a", "b")) {
      val xs = series.filter(_._1 == key).sortBy(_._2).map(_._3)
      val s = (for (i <- xs.indices; j <- i + 1 until xs.size)
        yield math.signum(xs(j) - xs(i)).toLong).sum
      val n = xs.size
      val tieSum = xs.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varS = (n.toDouble * (n - 1) * (2.0 * n + 5) - tieSum) / 18.0
      val zNum = if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0
      val r = got(key)
      assert(r.getLong(2) == s, s"$key S")
      assert(math.abs(r.getDouble(3) - zNum / math.sqrt(varS)) < 1e-5)
    }
    assert(got("m").getDouble(3) > 6) // strict monotone
    assert(got("c").isNullAt(3)) // zero variance
  }

  // ---- Cochran-Armitage trend ---------------------------------------------------

  test("trendTest: matches the literal Cochran-Armitage z on a planted " +
      "dose-response; flat rates score ~0") {
    val rows = (0 to 4).flatMap { lvl =>
      val n = 200; val x = 20 + lvl * 25 // monotone 10% -> 60%
      (1 to n).map(i => (lvl.toLong, if (i <= x) 1L else 0L))
    }
    val got = Eval.trendTest(rows.toDF("band", "y"), "band", "y")
      .collect()(0)
    val byLvl = rows.groupBy(_._1).toSeq.map { case (s, v) =>
      (s, v.map(_._2).sum, v.size.toLong) }
    val bigN = byLvl.map(_._3).sum
    val p = byLvl.map(_._2).sum.toDouble / bigN
    val num = byLvl.map { case (s, x, _) => s * x }.sum -
      p * byLvl.map { case (s, _, n) => s * n }.sum
    val va = p * (1 - p) * (byLvl.map { case (s, _, n) => s * s * n }.sum -
      math.pow(byLvl.map { case (s, _, n) => s * n }.sum, 2) / bigN)
    assert(math.abs(got.getDouble(0) - num / math.sqrt(va)) < 1e-5)
    assert(got.getDouble(0) > 10 && got.getDouble(1) < 1e-6)
    assert(got.getDouble(4) == 0.1 && got.getDouble(5) == 0.6)
    val flat = Eval.trendTest(
      (0 to 4).flatMap(lvl => (1 to 100).map(i =>
        (lvl.toLong, (i % 2).toLong))).toDF("band", "y"),
      "band", "y").collect()(0)
    assert(math.abs(flat.getDouble(0)) < 1e-9)
  }

  // ---- multiple testing (group z → Φ → BH) ------------------------------------

  test("proportionsByGroup: z and p match the literal pooled two-sample " +
      "computation of each group against the rest") {
    val rows = (1 to 600).map { i =>
      val g = s"g${i % 3}"
      // group g0 converts at ~0.5, others at ~0.2
      val succ = if (i % 3 == 0) i % 2 else (if (i % 5 == 0) 1 else 0)
      (g, succ.toLong)
    }
    val got = Eval.proportionsByGroup(rows.toDF("g", "s"), Seq("g"), "s")
      .collect().map(r => r.getString(0) -> r).toMap
    val bySucc = rows.groupBy(_._1).view.mapValues(v =>
      (v.map(_._2).sum, v.size.toLong)).toMap
    val (bigX, bigN) = (bySucc.values.map(_._1).sum,
      bySucc.values.map(_._2).sum)
    def phi(z: Double): Double = {
      val x = math.abs(z) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * x)
      val poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
        t * (-1.453152027 + t * 1.061405429))))
      0.5 * (1.0 + (1.0 - poly * math.exp(-(x * x))))
    }
    for ((g, (x, n)) <- bySucc) {
      val p1 = x.toDouble / n
      val p2 = (bigX - x).toDouble / (bigN - n)
      val pool = bigX.toDouble / bigN
      val se = math.sqrt(pool * (1 - pool) *
        (1.0 / n + 1.0 / (bigN - n).toDouble))
      val z = (p1 - p2) / se
      val r = got(g)
      assert(math.abs(r.getDouble(4) - z) < 1e-5, s"$g z")
      assert(math.abs(r.getDouble(5) - 2.0 * (1.0 - phi(z))) < 1e-5,
        s"$g p")
    }
    // the planted high-converting group is strongly significant
    assert(got("g0").getDouble(5) < 1e-4)
  }

  test("fdrAdjust: q-values are the textbook BH step-up (monotone suffix " +
      "min, clamped), rejections at the BH cutoff") {
    // classic example: m=5 p-values
    val ps = Seq(("t1", 0.01), ("t2", 0.04), ("t3", 0.03), ("t4", 0.005),
      ("t5", 0.9))
    val got = Eval.fdrAdjust(ps.toDF("id", "p"), Seq("id"), "p",
      alpha = 0.05).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    // sorted: .005(t4,1) .01(t1,2) .03(t3,3) .04(t2,4) .9(t5,5)
    // raw: .025 .025 .05 .05 .9 ; suffix-min: .025 .025 .05 .05 .9
    assert(got("t4") == ((1L, 0.025, true)))
    assert(got("t1") == ((2L, 0.025, true)))
    assert(got("t3") == ((3L, 0.05, true)))
    assert(got("t2") == ((4L, 0.05, true)))
    assert(got("t5") == ((5L, 0.9, false)))
  }

  test("fdrAdjust: uniform nulls are mostly retained at alpha 0.05 and " +
      "q never exceeds 1") {
    val ps = (1 to 100).map(i => (s"t$i", (i * 97 % 100 + 1) / 100.0))
    val out = Eval.fdrAdjust(ps.toDF("id", "p"), Seq("id"), "p").collect()
    assert(out.forall(_.getDouble(3) <= 1.0))
    assert(out.count(_.getBoolean(4)) == 0) // uniform grid: nothing passes
  }

  // ---- cross-correlation -----------------------------------------------------

  private def bruteCcf(xs: Seq[Double], ys: Seq[Double], k: Int)
      : Option[Double] = {
    // pair x_t with y_{t-k} where both indices are in range
    val pairs = xs.indices.flatMap { t =>
      val j = t - k
      if (j >= 0 && j < ys.size) Some((xs(t), ys(j))) else None
    }
    if (pairs.size < 2) return None
    val n = pairs.size.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val vx = pairs.map(p => p._1 * p._1).sum - sx * sx / n
    val vy = pairs.map(p => p._2 * p._2).sum - sy * sy / n
    val cxy = pairs.map(p => p._1 * p._2).sum - sx * sy / n
    if (vx <= 0 || vy <= 0) None else Some(cxy / math.sqrt(vx * vy))
  }

  test("ccf: matches the literal pairwise-complete estimator at every " +
      "lag on random integer series") {
    val maxLag = 3
    val n = 30
    val series = for (key <- Seq("a", "b"); t <- 1 to n) yield
      (key, t.toLong, rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble)
    val got = Eval.ccf(series.toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y", maxLag).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for (key <- Seq("a", "b"); k <- -maxLag to maxLag) {
      val rows = series.filter(_._1 == key).sortBy(_._2)
      (got((key, k)), bruteCcf(rows.map(_._3), rows.map(_._4), k)) match {
        case (Some(g), Some(e)) =>
          assert(math.abs(g - e) < 2e-6, s"$key lag $k: $g vs $e")
        case (g, e) => assert(g.isEmpty == e.isEmpty, s"$key lag $k")
      }
    }
  }

  test("ccf: a planted y-leads-x-by-2 relationship peaks exactly at " +
      "lag 2 with correlation 1") {
    val ys = (1 to 40).map(_ => rnd.nextInt(50).toDouble)
    val rows = (1 to 40).map { t =>
      val x = if (t > 2) ys(t - 3) * 2 + 5 else 0.0 // x_t = f(y_{t-2})
      ("k", t.toLong, x, ys(t - 1))
    }
    val got = Eval.ccf(rows.toDF("k", "t", "x", "y"), Seq("k"), "t",
      "x", "y", maxLag = 3)
      .collect().filter(!_.isNullAt(2))
      .map(r => (r.getInt(1), r.getDouble(2))).toMap
    // x rows with t<=2 are the constant 0 head; restrict to the clean lag
    assert(got(2) > 0.8, s"got $got")
    assert(got(2) == got.values.max)
  }

  // ---- quantile normalization --------------------------------------------------

  test("quantileNormalize: the map equals the literal nearest-rank " +
      "lookup on tied random data, both cumulative paths") {
    val ref = (1 to 400).map(_ => ("a", rnd.nextInt(50) * 2.0)) // evens
    val tgt = (1 to 250).map(_ => ("b", rnd.nextInt(40) * 2.0 + 1)) // odds
    val df = (ref ++ tgt).toDF("g", "x")
    val refSorted = ref.map(_._2).sorted
    val tgtVals = tgt.map(_._2)
    val expected = tgtVals.distinct.sorted.map { v =>
      val cum = tgtVals.count(_ <= v).toLong
      val k = ((cum * refSorted.size + tgtVals.size - 1) /
        tgtVals.size).toInt
      v -> (refSorted(k - 1), k.toLong)
    }.toMap
    for (thr <- Seq(100000L, 5L)) {
      val got = Eval.quantileNormalize(df, "x", "g", target = "b",
        ref = "a", maxDistinctBroadcast = thr).collect()
        .map(r => r.getDouble(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(got == expected, s"thr=$thr")
    }
  }

  test("quantileNormalize: mapping a distribution onto itself is the " +
      "identity on every distinct value") {
    val rows = (0 to 36).flatMap(v =>
      Seq(("a", v.toDouble), ("b", v.toDouble), ("a", v.toDouble)))
    val out = Eval.quantileNormalize(rows.toDF("g", "x"), "x", "g",
      target = "b", ref = "a").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  // ---- exact two-sample KS ---------------------------------------------------

  private def bruteKs(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    val values = (a ++ b).distinct.sorted
    val ds = values.map(v => (
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size), v))
    ds.maxBy(d => (d._1, -d._2)) // max d, smallest value on ties
  }

  test("ksExact: small and binned paths both equal the literal ECDF " +
      "sweep on tied random data, including the argmax location") {
    val a = (1 to 300).map(_ => rnd.nextInt(25).toDouble)
    val b = (1 to 200).map(_ => rnd.nextInt(25).toDouble + 3)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "x")
    val (d, at) = bruteKs(a, b)
    for (thr <- Seq(100000L, 3L)) {
      val r = Eval.ksExact(df, "x", "g", "a", "b",
        maxDistinctBroadcast = thr).collect()(0)
      assert(math.abs(r.getDouble(0) - d) < 1e-6, s"thr=$thr")
      assert(r.getDouble(1) == at, s"thr=$thr location")
      assert(r.getLong(3) == 300L && r.getLong(4) == 200L)
      val z = d * math.sqrt(300.0 * 200.0 / 500.0)
      assert(math.abs(r.getDouble(2) - z) < 1e-6)
    }
  }

  test("ksExact: identical samples score d = 0; disjoint supports " +
      "score d = 1") {
    val same = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble))).toDF("g", "x")
    assert(Eval.ksExact(same, "x", "g", "a", "b")
      .collect()(0).getDouble(0) == 0.0)
    val disjoint = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i + 1000.0))).toDF("g", "x")
    assert(Eval.ksExact(disjoint, "x", "g", "a", "b")
      .collect()(0).getDouble(0) == 1.0)
  }

  // ---- forecast backtest ----------------------------------------------------

  test("forecastBacktest: matches the literal seasonal-naive vs naive-1 " +
      "scoring on random integer series") {
    val season = 4
    val series = for {
      key <- Seq("a", "b"); t <- 1 to (12 + rnd.nextInt(20))
    } yield (key, t.toLong, rnd.nextInt(30).toDouble)
    val got = Eval.forecastBacktest(series.toDF("k", "t", "x"),
      Seq("k"), "t", "x", season).collect()
      .map(r => r.getString(0) -> r).toMap
    for (key <- Seq("a", "b")) {
      val xs = series.filter(_._1 == key).sortBy(_._2).map(_._3)
      val idx = (season until xs.size) // rows where both lags defined
      val es = idx.map(t => math.abs(xs(t) - xs(t - season))).sum
      val e1 = idx.map(t => math.abs(xs(t) - xs(t - 1))).sum
      val r = got(key)
      assert(r.getLong(1) == idx.size.toLong)
      assert(math.abs(r.getDouble(2) - es / idx.size) < 1e-6)
      assert(math.abs(r.getDouble(6) - (1.0 - es / e1)) < 1e-6)
    }
  }

  test("forecastBacktest: a strict weekly pattern scores skill 1.0 " +
      "(zero seasonal error); too-short series are omitted") {
    val weekly = (1 to 35).map(t => ("w", t.toLong, (t % 7 * 10).toDouble))
    val short = (1 to 5).map(t => ("s", t.toLong, t.toDouble))
    val out = Eval.forecastBacktest((weekly ++ short).toDF("k", "t", "x"),
      Seq("k"), "t", "x", season = 7).collect()
    assert(out.length == 1 && out(0).getString(0) == "w")
    assert(out(0).getDouble(2) == 0.0) // mae_season exact zero
    assert(out(0).getDouble(6) == 1.0) // skill
  }

  // ---- Poisson bootstrap ---------------------------------------------------

  test("bootstrapMeanCI: deterministic across runs, exact overall mean, " +
      "ordered CI that brackets the mean on symmetric data") {
    val df = (1 to 2000).map(i => (i.toLong, (i % 100).toLong))
      .toDF("id", "cents")
    val a = Eval.bootstrapMeanCI(df, "cents", "id").collect()(0)
    val b = Eval.bootstrapMeanCI(df, "cents", "id").collect()(0)
    assert(a == b) // no RNG state anywhere
    assert(a.getDouble(0) == 49.5) // exact integral mean
    assert(a.getDouble(1) <= a.getDouble(0) &&
      a.getDouble(0) <= a.getDouble(2))
    assert(a.getDouble(1) < a.getDouble(2))
    assert(a.getLong(4) == 2000L && a.getLong(5) == 32L)
  }

  test("bootstrapMeanCI: Poisson weights are location-equivariant — " +
      "shifting every value by c shifts mean and CI by c") {
    val df = (1 to 500).map(i => (i.toLong, (i % 50).toLong))
      .toDF("id", "v")
    val base = Eval.bootstrapMeanCI(df, "v", "id").collect()(0)
    val shifted = Eval.bootstrapMeanCI(
      df.withColumn("v", col("v") + 1000L), "v", "id").collect()(0)
    assert(math.abs(shifted.getDouble(0) - base.getDouble(0) - 1000) < 1e-9)
    assert(math.abs(shifted.getDouble(1) - base.getDouble(1) - 1000) < 1e-9)
    assert(math.abs(shifted.getDouble(2) - base.getDouble(2) - 1000) < 1e-9)
  }

  test("bootstrapMeanCI: thresholds are the Poisson(1) CDF on the 60-bit " +
      "scale and imply mean weight ~= 1") {
    val probs = (0 to 7).scanLeft(0.0) { (acc, k) =>
      acc + math.exp(-1.0) / (1 to k).map(_.toDouble).product
    }.tail
    Eval.PoissonT.zip(probs).foreach { case (t, c) =>
      assert(t == math.floor(c * math.pow(2.0, 60)).toLong)
    }
    assert(probs.last > 0.99998) // k>8 tail truncation: ~1e-5 of mass
    // empirical: Σw across replicates ~ n per replicate (weights are the
    // only source of variation on constant data, so mean_r == x exactly)
    val const = (1 to 400).map(i => (i.toLong, 7L)).toDF("id", "v")
    val r = Eval.bootstrapMeanCI(const, "v", "id").collect()(0)
    assert(r.getDouble(1) == 7.0 && r.getDouble(2) == 7.0 &&
      r.getDouble(3) == 0.0)
  }

  // ---- ranking metrics (NDCG / MRR / MAP at k) ---------------------------

  /** Literal single-threaded replay of the quantized ranking metrics:
    * same integer tables, same floor divisions, no Spark. */
  private def bruteRankingInts(rows: Seq[(Int, Long, Double, Long)],
      k: Int): Seq[(Int, Long, Long, Long, Long, Long)] = {
    val d = Eval.dcgDiscounts(k)
    val rr = Eval.rrTable(k)
    rows.groupBy(_._1).toSeq.map { case (q, items) =>
      val byScore = items.sortBy(r => (-r._3, r._2))
      val byIdeal = items.sortBy(r => (-r._4, r._2))
      val dcg = byScore.take(k).zipWithIndex
        .map { case (r, i) => r._4 * d(i) }.sum
      val idcg = byIdeal.take(k).zipWithIndex
        .map { case (r, i) => r._4 * d(i) }.sum
      val rrInt = byScore.take(k).zipWithIndex
        .collectFirst { case (r, i) if r._4 > 0 => rr(i) }.getOrElse(0L)
      var cum = 0L
      val apNum = byScore.take(k).zipWithIndex.map { case (r, i) =>
        if (r._4 > 0) { cum += 1
          math.floor(cum.toDouble * Eval.RankQ / (i + 1).toDouble).toLong
        } else 0L
      }.sum
      val nRel = items.count(_._4 > 0).toLong
      (q, dcg, idcg, rrInt, apNum, nRel)
    }
  }

  test("rankingMetrics: equals the literal quantized replay on random " +
      "graded data, and tracks the un-quantized textbook values") {
    val k = 5
    val rows = for {
      q <- 1 to 40
      i <- 1 to (3 + rnd.nextInt(10))
    } yield (q, i.toLong, rnd.nextInt(1000) / 1000.0, rnd.nextInt(4).toLong)
    val df = rows.toDF("q", "i", "s", "r")
    val got = Eval.rankingMetrics(df, "q", "i", "s", "r", k).collect()(0)

    val pq = bruteRankingInts(rows, k).filter(_._6 > 0)
    val nScored = pq.size
    val qd = Eval.RankQ.toDouble
    val ndcg = pq.map(r =>
      math.floor(r._2.toDouble * Eval.RankQ / r._3.toDouble)).sum /
      (qd * nScored)
    val mrr = pq.map(_._4).sum / (qd * nScored)
    val ap = pq.map(r =>
      math.floor(r._5.toDouble / math.min(r._6, k.toLong))).sum /
      (qd * nScored)
    assert(got.getDouble(0) == BigDecimal(ndcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getDouble(1) == BigDecimal(mrr)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getDouble(2) == BigDecimal(ap)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getLong(3) == 40L && got.getLong(4) == nScored.toLong)

    // un-quantized textbook NDCG for the same data stays within 2^-19
    val exact = {
      def disc(i: Int) = 1.0 / (math.log(i + 2.0) / math.log(2.0))
      rows.groupBy(_._1).toSeq.flatMap { case (_, items) =>
        val byScore = items.sortBy(r => (-r._3, r._2)).take(k)
        val byIdeal = items.sortBy(r => (-r._4, r._2)).take(k)
        val idcg = byIdeal.zipWithIndex.map { case (r, i) =>
          r._4 * disc(i) }.sum
        if (idcg == 0) None
        else Some(byScore.zipWithIndex.map { case (r, i) =>
          r._4 * disc(i) }.sum / idcg)
      }
    }
    assert(math.abs(got.getDouble(0) - exact.sum / exact.size) < 1e-4)
  }

  test("rankingMetrics: perfect ranking scores 1.0 on all three; " +
      "reversed ranking scores strictly less") {
    val rows = for { q <- 1 to 10; i <- 1 to 8 } yield
      (q, i.toLong, 1.0 - i / 10.0, math.max(0L, 4L - i)) // rel 3,2,1,0,0…
    val df = rows.toDF("q", "i", "s", "r")
    val perfect = Eval.rankingMetrics(df, "q", "i", "s", "r", 8).collect()(0)
    assert(perfect.getDouble(0) == 1.0 && perfect.getDouble(1) == 1.0 &&
      perfect.getDouble(2) == 1.0)
    val reversed = Eval.rankingMetrics(
      rows.map(r => (r._1, r._2, -r._3, r._4)).toDF("q", "i", "s", "r"),
      "q", "i", "s", "r", 8).collect()(0)
    assert(reversed.getDouble(0) < 1.0 && reversed.getDouble(1) < 1.0 &&
      reversed.getDouble(2) < 1.0)
  }

  test("rankingPerQuery: no-relevant queries get null metrics but stay " +
      "counted; relevant-outside-top-k query scores rr = 0") {
    val rows = Seq(
      // q1: relevant at rank 3 of 3 with k=2 → scored, rr 0
      (1, 1L, 0.9, 0L), (1, 2L, 0.8, 0L), (1, 3L, 0.1, 1L),
      // q2: nothing relevant → null metrics
      (2, 1L, 0.9, 0L), (2, 2L, 0.8, 0L))
    val out = Eval.rankingPerQuery(rows.toDF("q", "i", "s", "r"),
      "q", "i", "s", "r", k = 2).orderBy("q").collect()
    assert(out(0).getDouble(2) == 0.0) // rr
    assert(out(0).getDouble(1) == 0.0 && out(0).getDouble(3) == 0.0)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
    val summary = Eval.rankingMetrics(rows.toDF("q", "i", "s", "r"),
      "q", "i", "s", "r", k = 2).collect()(0)
    assert(summary.getLong(3) == 2L && summary.getLong(4) == 1L)
  }
}
