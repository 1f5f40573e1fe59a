package graft

import graft.relational.Sketches
import org.apache.spark.sql.functions._

/** Mergeable HLL: error bounds at both estimator regimes, exact merge
  * associativity (the property that makes sketch TABLES work), and
  * determinism. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within rigor bounds: linear-counting and raw regimes") {
    // 100 distinct (linear counting: tight) and 10k distinct (raw HLL:
    // within ~3 sigma of the 1.04/sqrt(256) = 6.5% standard error)
    val small = (0 until 100).map(i => ("g", s"u$i")).toDF("grp", "k")
    val eSmall = Sketches.approxDistinct(small, Seq("grp"), "k")
      .head().getDouble(1)
    assert(math.abs(eSmall - 100) / 100.0 < 0.05, s"small: $eSmall")

    val big = (0 until 10000).map(i => ("g", s"user-$i")).toDF("grp", "k")
    val eBig = Sketches.approxDistinct(big, Seq("grp"), "k")
      .head().getDouble(1)
    assert(math.abs(eBig - 10000) / 10000.0 < 0.2, s"big: $eBig")
  }

  test("duplicates don't move the estimate") {
    val once = (0 until 500).map(i => ("g", s"k$i")).toDF("grp", "k")
    val dup = (0 until 500).flatMap(i => Seq.fill(7)(("g", s"k$i")))
      .toDF("grp", "k")
    assert(Sketches.approxDistinct(once, Seq("grp"), "k").head().getDouble(1)
      == Sketches.approxDistinct(dup, Seq("grp"), "k").head().getDouble(1))
  }

  test("merged partition sketches == whole-corpus sketch, exactly") {
    val rows = (0 until 3000).map(i => (s"part${i % 3}", s"id-${i % 1100}"))
      .toDF("grp", "k")
    // per-partition registers, then merge to one global group
    val parts = Sketches.hllSketch(rows, Seq("grp"), "k")
      .withColumn("all", lit("all"))
    val merged = Sketches.hllMerge(parts, Seq("all"))
      .select(col("all").as("grp"), col("bucket"), col("rho"))
    // direct sketch of the union under the same single group
    val direct = Sketches.hllSketch(rows.withColumn("grp", lit("all")),
      Seq("grp"), "k")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
    // and identical estimates
    assert(Sketches.hllEstimate(merged, Seq("grp")).head().getDouble(1)
      == Sketches.hllEstimate(direct, Seq("grp")).head().getDouble(1))
  }

  test("register shape: bucket in [0, m), rho in [1, cap]") {
    val rows = (0 until 2000).map(i => ("g", s"v$i")).toDF("grp", "k")
    val reg = Sketches.hllSketch(rows, Seq("grp"), "k")
    val bad = reg.filter(col("bucket") < 0 || col("bucket") >= Sketches.M ||
      col("rho") < 1 || col("rho") > Sketches.RhoCap)
    assert(bad.isEmpty)
    assert(reg.count() <= Sketches.M)
  }

  test("estimates are per-group independent") {
    val rows = ((0 until 800).map(i => ("a", s"x$i")) ++
      (0 until 50).map(i => ("b", s"y$i"))).toDF("grp", "k")
    val est = Sketches.approxDistinct(rows, Seq("grp"), "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("a") - 800) / 800.0 < 0.2)
    assert(math.abs(est("b") - 50) / 50.0 < 0.1)
  }

  // ---- Count-Min ------------------------------------------------------

  private def cmsEsts(df: org.apache.spark.sql.DataFrame)
      : Map[String, Long] = {
    val probes = df.select("grp", "k").distinct()
    Sketches.cmsEstimate(Sketches.cmsSketch(df, Seq("grp"), "k"),
      probes, Seq("grp"), "k")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
  }

  test("cms estimate never underestimates and is exact without stress") {
    // 200 keys with known counts, far under w=1024: collisions possible
    // but est >= truth always, and total overestimate stays tiny
    val truth = (0 until 200).map(i => s"k$i" -> (i % 9 + 1).toLong).toMap
    val rows = truth.toSeq.flatMap { case (k, n) =>
      Seq.fill(n.toInt)(("g", k)) }.toDF("grp", "k")
    val est = cmsEsts(rows)
    truth.foreach { case (k, n) => assert(est(k) >= n, s"$k: ${est(k)} < $n") }
    assert(est.values.sum <= truth.values.sum + 40)
  }

  test("cms merged registers == direct coarse sketch, exactly") {
    val rows = (0 until 2000)
      .map(i => (s"2024-${i % 4}", s"id${i % 97}")).toDF("mon", "k")
      .withColumn("yr", lit("2024"))
    val merged = Sketches.cmsMerge(
      Sketches.cmsSketch(rows, Seq("mon"), "k").withColumn("yr", lit("2024")),
      Seq("yr"))
    val direct = Sketches.cmsSketch(rows, Seq("yr"), "k")
    assert(merged.select("yr", "row_j", "col", "cnt")
      .exceptAll(direct.select("yr", "row_j", "col", "cnt")).isEmpty)
    assert(direct.select("yr", "row_j", "col", "cnt")
      .exceptAll(merged.select("yr", "row_j", "col", "cnt")).isEmpty)
  }

  test("cms join-size estimate bounds the true inner product") {
    // 100 keys with counts 1..10 across two relations; w=1024 >> keys so
    // the estimate should be near-exact, and never BELOW the truth
    val a = (0 until 100).flatMap(i => Seq.fill(i % 10 + 1)(("g", s"k$i")))
      .toDF("grp", "k")
    val b = (0 until 100).flatMap(i => Seq.fill((i * 3) % 7 + 1)(("g",
      s"k$i"))).toDF("grp", "k")
    val truth = (0 until 100).map(i => (i % 10 + 1).toLong *
      ((i * 3) % 7 + 1)).sum
    val est = Sketches.cmsJoinSize(
      Sketches.cmsSketch(a, Seq("grp"), "k"),
      Sketches.cmsSketch(b, Seq("grp"), "k"), Seq("grp"))
      .head().getLong(1)
    assert(est >= truth, s"$est < $truth")
    // collision overestimate: E ≈ ‖fA‖₁·‖fB‖₁/w per row; allow 3×
    val slack = 3L * (a.count() * b.count()) / Sketches.CmsW
    assert(est <= truth + slack, s"$est way over $truth (+$slack)")
  }

  // ---- Bloom ----------------------------------------------------------

  test("bloom never false-negatives and merged == direct coarse sketch") {
    val rows = (0 until 400).map(i => (s"m${i % 4}", s"key-$i"))
      .toDF("mon", "k").withColumn("yr", lit("y"))
    val merged = Sketches.bloomMerge(
      Sketches.bloomSketch(rows, Seq("mon"), "k").withColumn("yr", lit("y")),
      Seq("yr"))
    val direct = Sketches.bloomSketch(rows, Seq("yr"), "k")
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty)
    // every inserted key probes true
    val present = Sketches.bloomContains(direct,
      rows.select("yr", "k").distinct(), Seq("yr"), "k")
    assert(present.filter(!col("maybe_present")).isEmpty)
  }

  test("bloom false-positive rate stays near the design point") {
    val rows = (0 until 800).map(i => ("g", s"in-$i")).toDF("grp", "k")
    val reg = Sketches.bloomSketch(rows, Seq("grp"), "k")
    val absent = (0 until 2000).map(i => ("g", s"out-$i")).toDF("grp", "k")
    val fp = Sketches.bloomContains(reg, absent, Seq("grp"), "k")
      .filter(col("maybe_present")).count()
    // n≈m/10 → ~1%; allow generous slack for hash luck
    assert(fp < 100, s"fp=$fp of 2000")
  }

  test("cms registers stay within the d x w bound") {
    val rows = (0 until 5000).map(i => ("g", s"key-$i")).toDF("grp", "k")
    val reg = Sketches.cmsSketch(rows, Seq("grp"), "k")
    assert(reg.count() <= Sketches.CmsD.toLong * Sketches.CmsW)
    assert(reg.filter(col("col") < 0 ||
      col("col") >= Sketches.CmsW).isEmpty)
    assert(reg.filter(col("row_j") < 0 ||
      col("row_j") >= Sketches.CmsD).isEmpty)
  }

  test("quantile sketch: estimate within one bin width above the exact " +
    "quantile") {
    val rng = new scala.util.Random(7)
    val vals = (0 until 4000).map(_ => rng.nextDouble() * 1000.0)
    val df = vals.map(("g", _)).toDF("grp", "v")
    val reg = Sketches.qSketch(df, Seq("grp"), "v", lo = 0.0, hi = 1000.0)
    val got = Sketches.qQuantile(reg, Seq("grp"),
      Seq((1, 4), (1, 2), (3, 4)), lo = 0.0, hi = 1000.0)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3))
      .toMap
    val sorted = vals.sorted
    val binW = 1000.0 / Sketches.QBins
    for ((n, d) <- Seq((1, 4), (1, 2), (3, 4))) {
      val target = (sorted.length.toLong * n + d - 1) / d
      val exact = sorted(target.toInt - 1)
      val est = got((n, d))
      assert(est >= exact && est <= exact + 2 * binW,
        s"q=$n/$d est=$est exact=$exact")
    }
  }

  test("quantile sketch: merged registers equal sketching the coarse " +
    "group directly; out-of-range values clamp to edge bins") {
    val rows = Seq(
      ("2024-01", -5.0), ("2024-01", 10.0), ("2024-02", 55.0),
      ("2024-02", 250.0), ("2025-01", 99.9), ("2025-03", 60.0)
    ).toDF("month", "v")
    val months = Sketches.qSketch(rows, Seq("month"), "v",
      lo = 0.0, hi = 100.0, bins = 10)
      .withColumn("year", substring(col("month"), 1, 4))
    val merged = Sketches.qMerge(months, Seq("year"))
    val direct = Sketches.qSketch(
      rows.withColumn("year", substring(col("month"), 1, 4)),
      Seq("year"), "v", lo = 0.0, hi = 100.0, bins = 10)
    assert(merged.select("year", "bin", "cnt")
      .exceptAll(direct).isEmpty &&
      direct.exceptAll(merged.select("year", "bin", "cnt")).isEmpty)
    // -5 clamps to bin 0; 250 clamps to bin 9
    val reg24 = direct.filter(col("year") === "2024")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(reg24.contains(0L) && reg24.contains(9L))
  }

  test("hll intersect: inclusion-exclusion tracks the true overlap and " +
    "clamps disjoint sets at zero") {
    // A = 0..999, B = 500..1499 → |A∩B| = 500
    val a = (0 until 1000).map(i => ("g", s"u$i")).toDF("grp", "k")
    val b = (500 until 1500).map(i => ("g", s"u$i")).toDF("grp", "k")
    val ra = Sketches.hllSketch(a, Seq("grp"), "k")
    val rb = Sketches.hllSketch(b, Seq("grp"), "k")
    val row = Sketches.hllIntersect(ra, rb, Seq("grp")).collect()(0)
    val (estA, estB, estU, estI) =
      (row.getDouble(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4))
    assert(math.abs(estA - 1000) / 1000 < 0.2, s"est_a=$estA")
    assert(math.abs(estU - 1500) / 1500 < 0.2, s"est_union=$estU")
    // intersection inherits ~3 estimates' noise — generous band
    assert(estI > 150 && estI < 850, s"est_intersect=$estI")
    assert(math.abs(estI - (estA + estB - estU)) < 1e-6 || estI == 0.0)
    // disjoint sets: clamp keeps the estimate at >= 0
    val c = (5000 until 6000).map(i => ("g", s"u$i")).toDF("grp", "k")
    val disjoint = Sketches.hllIntersect(ra,
      Sketches.hllSketch(c, Seq("grp"), "k"), Seq("grp"))
      .collect()(0).getDouble(4)
    assert(disjoint >= 0.0 && disjoint < 300, s"disjoint=$disjoint")
  }

  test("quantile sketch: ceil-rank target semantics on a hand case") {
    // 4 values in distinct bins; median target = ceil(4/2) = 2nd value
    val rows = Seq(("g", 5.0), ("g", 15.0), ("g", 25.0), ("g", 35.0))
      .toDF("grp", "v")
    val reg = Sketches.qSketch(rows, Seq("grp"), "v",
      lo = 0.0, hi = 40.0, bins = 4)
    val med = Sketches.qQuantile(reg, Seq("grp"), Seq((1, 2)),
      lo = 0.0, hi = 40.0, bins = 4).collect()(0).getDouble(3)
    // 2nd value (15.0) lives in bin 1 → upper edge 20.0
    assert(med == 20.0)
  }

  test("weighted quantile sketch: weight-1 equals the unweighted sketch; " +
      "weighted median lands in the weight-mass bin") {
    val vals = Seq(1.0, 5.0, 9.0).flatMap(v => Seq.fill(4)(("g", v)))
      .toDF("grp", "v").withColumn("w", lit(1L))
    val a = Sketches.qSketch(vals, Seq("grp"), "v", lo = 0.0, hi = 10.0,
      bins = 10).orderBy("bin").collect().toSeq
    val b = Sketches.qSketchWeighted(vals, Seq("grp"), "v", "w",
      lo = 0.0, hi = 10.0, bins = 10).orderBy("bin").collect().toSeq
    assert(a == b)
    // value 9 carries 90% of the weight -> weighted median in its bin
    val wdf = Seq(("g", 1.0, 1L), ("g", 9.0, 9L)).toDF("grp", "v", "w")
    val med = Sketches.qQuantile(
      Sketches.qSketchWeighted(wdf, Seq("grp"), "v", "w", 0.0, 10.0, 10),
      Seq("grp"), Seq((1, 2)), 0.0, 10.0, 10)
      .head().getDouble(3)
    assert(med == 10.0) // bin 9's upper edge
    // zero/negative/null weights dropped
    val drop = Seq(("g", 1.0, 0L), ("g", 2.0, -3L)).toDF("grp", "v", "w")
    assert(Sketches.qSketchWeighted(drop, Seq("grp"), "v", "w",
      0.0, 10.0, 10).count() == 0)
  }

  test("hll rolling: window merge of daily registers == sketching each " +
      "trailing window from raw, register-for-register") {
    val rows = (0 until 400).map(i => (i % 10L, s"u${i % 57}"))
      .toDF("day", "k")
    val daily = Sketches.hllSketch(rows, Seq("day"), "k")
    val rolled = Sketches.hllRolling(daily, "day", window = 3)
      .collect().map(r => (r.get(0), r.get(1)) -> r.get(2)).toMap
    // direct side filtered to observed periods: rolling labels past the
    // max observed day are phantom partial windows hllRolling drops
    val direct = Sketches.hllSketch(
      rows.withColumn("day", explode(sequence(col("day"),
        col("day") + 2))).filter(col("day") <= 9), Seq("day"), "k")
      .collect().map(r => (r.get(0), r.get(1)) -> r.get(2)).toMap
    assert(rolled == direct && rolled.nonEmpty)
    assert(!rolled.keys.exists { case (d, _) =>
      d.asInstanceOf[Long] > 9 })
  }

  test("hh: base sketch keeps exact top-k counts and the (k+1)-th floor") {
    // zipf-ish: item i appears (40 - i) times
    val rows = (0 until 40).flatMap(i =>
      Seq.fill(40 - i)(("g", f"item$i%02d"))).toDF("grp", "k")
    val reg = Sketches.hhSketch(rows, Seq("grp"), "k", k = 5)
    val kept = reg.filter(col("item").isNotNull)
      .orderBy(desc("cnt"), col("item")).collect()
    assert(kept.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("item00", 40L), ("item01", 39L), ("item02", 38L),
        ("item03", 37L), ("item04", 36L)))
    val floor = reg.filter(col("item").isNull).collect()
    assert(floor.length == 1 && floor(0).getLong(2) == 35L)
    // fewer than k+1 distinct items → floor 0, all kept
    val tiny = Seq(("g", "a"), ("g", "a"), ("g", "b")).toDF("grp", "k")
    val regT = Sketches.hhSketch(tiny, Seq("grp"), "k", k = 5)
    assert(regT.filter(col("item").isNull).head().getLong(2) == 0L)
    assert(regT.filter(col("item").isNotNull).count() == 2)
  }

  test("hh: tie-break is (cnt desc, item asc) like SQL ORDER BY") {
    val rows = Seq("b", "a", "d", "c").flatMap(i => Seq.fill(3)(("g", i)))
      .toDF("grp", "k")
    val kept = Sketches.hhSketch(rows, Seq("grp"), "k", k = 2)
      .filter(col("item").isNotNull)
      .orderBy(col("item")).collect().map(_.getString(1)).toSeq
    assert(kept == Seq("a", "b"))
  }

  test("hh: merged bounds bracket the true counts, kept counts are " +
      "certain lower bounds, dropped mass stays under the floor") {
    // three "days"; two hot items everywhere; a medium item concentrated
    // in day 0 (dropped by the k=2 daily truncation → its mass lands in
    // the floors); cold tail items
    val day = (d: Int) =>
      (0 until 2).flatMap(i => Seq.fill(50)((s"d$d", s"hot$i"))) ++
        Seq.fill(if (d == 0) 30 else 2)((s"d$d", "medium")) ++
        (0 until 20).map(i => (s"d$d", s"cold-$d-$i"))
    val rows = (0 until 3).flatMap(day).toDF("sub", "k")
      .withColumn("grp", lit("g"))
    val daily = Sketches.hhSketch(rows, Seq("grp", "sub"), "k", k = 2)
    val merged = Sketches.hhMerge(daily.drop("sub"), Seq("grp"), k = 2)
    val top = Sketches.hhTopK(merged, Seq("grp")).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    val truth = rows.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    top.foreach { case (item, (lo, hi)) =>
      assert(lo <= truth(item), s"$item: lo $lo > true ${truth(item)}")
      assert(truth(item) <= hi, s"$item: true ${truth(item)} > hi $hi")
    }
    // the always-hot items carry exact lower bounds == truth
    assert(top("hot0")._1 == 150L && top("hot1")._1 == 150L)
    // 'medium' was truncated away daily (floors 30, 2, 2); the invariant
    // still prices it: true count ≤ merged floor
    assert(!top.contains("medium"))
    val floor = merged.filter(col("item").isNull).head().getLong(2)
    assert(truth("medium") <= floor, s"floor $floor < ${truth("medium")}")
  }

  test("hh: n-way merge of sub-sketches == one coarse truncation of the " +
      "summed kept rows (replay determinism)") {
    val rows = (0 until 500).map(i => ("g", s"s${i % 7}", s"u${i % 23}"))
      .toDF("grp", "sub", "k")
    val daily = Sketches.hhSketch(rows, Seq("grp", "sub"), "k", k = 4)
    val m1 = Sketches.hhMerge(daily.drop("sub"), Seq("grp"), k = 4)
      .orderBy(col("item").asc_nulls_first).collect().toSeq
    val m2 = Sketches.hhMerge(daily.drop("sub"), Seq("grp"), k = 4)
      .orderBy(col("item").asc_nulls_first).collect().toSeq
    assert(m1 == m2 && m1.nonEmpty)
  }
}
