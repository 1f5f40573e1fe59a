package graft

import org.apache.spark.sql.functions._

import graft.relational.Analytics

class AnalyticsV2Spec extends SparkSpec {
  import spark.implicits._

  // ---- groupedOls --------------------------------------------------------

  test("ols: exact line recovered per group, r2 = 1; noisy group sane") {
    val exact = (1 to 5).map(i => ("a", i.toDouble, 3.0 * i + 2.0))
    val noisy = Seq(("b", 1.0, 1.0), ("b", 2.0, 3.0), ("b", 3.0, 2.0),
      ("b", 4.0, 5.0))
    val df = (exact ++ noisy).toDF("g", "x", "y")
    val got = Analytics.groupedOls(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("a") == ((5L, 3.0, 2.0, 1.0)))
    val (n, slope, intercept, r2) = got("b")
    assert(n == 4L)
    // hand OLS on the noisy points: slope 1.1, intercept 0.0
    assert(slope == 1.1 && intercept == 0.0)
    assert(r2 > 0 && r2 < 1)
  }

  test("ols: zero-variance x gives null slope; nulls skipped") {
    val df = Seq(("g", Some(2.0), Some(1.0)), ("g", Some(2.0), Some(5.0)),
      ("g", None, Some(9.0)), ("g", Some(3.0), None))
      .toDF("g", "x", "y")
    val r = Analytics.groupedOls(df, Seq("g"), "x", "y").head()
    assert(r.getLong(1) == 2L) // only the two non-null pairs
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  // ---- association -------------------------------------------------------

  test("association: independent columns give chi2 ~ 0, mi ~ 0") {
    // perfectly independent 2x2: every (a,b) cell has count 25
    val df = (for { a <- Seq("x", "y"); b <- Seq("u", "v");
      _ <- 1 to 25 } yield (a, b)).toDF("a", "b")
    val r = Analytics.association(df, "a", "b").head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 4L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("association: perfect dependence matches the closed form") {
    // a == b bijectively, k=3 levels, 10 rows each: chi2 = N*(k-1),
    // mi = ln k
    val df = (for { l <- Seq("p", "q", "r"); _ <- 1 to 10 }
      yield (l, l.toUpperCase)).toDF("a", "b")
    val r = Analytics.association(df, "a", "b").head()
    assert(r.getLong(0) == 30L && r.getLong(1) == 3L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 60.0)
    assert(math.abs(r.getDouble(4) - math.log(3.0)) < 1e-6)
  }

  test("association: zero-observed cells are counted in chi2 " +
      "(full-table statistic, not observed-cells-only)") {
    // 2x2 with one empty cell: a=x pairs only with u, a=y with both
    val df = (Seq.fill(10)(("x", "u")) ++ Seq.fill(5)(("y", "u")) ++
      Seq.fill(5)(("y", "v"))).toDF("a", "b")
    val r = Analytics.association(df, "a", "b").head()
    // hand: N=20, row x=10,y=10; col u=15,v=5. E: xu 7.5, xv 2.5,
    // yu 7.5, yv 2.5. chi2 = (2.5^2/7.5)*2 + (2.5^2/2.5)*2 = 20/3 + 5...
    // = 0.8333*2 + 2.5*2 = 6.666667
    assert(r.getLong(1) == 3L) // only 3 observed cells
    assert(math.abs(r.getDouble(3) - 20.0 / 3.0) < 1e-5)
  }

  // ---- attribution -------------------------------------------------------

  test("attribution: last- and first-touch per conversion, " +
      "unattributed conversions dropped") {
    val df = Seq(
      // user 1: ad -> email -> buy(10) : last=email, first=ad
      (1L, 1L, 1L, "ad", 0.0), (1L, 2L, 2L, "email", 0.0),
      (1L, 3L, 3L, "buy", 10.0),
      // user 1 again: buy(5) right after -> last=email, first=ad
      (1L, 4L, 4L, "buy", 5.0),
      // user 2: buy with no preceding touch -> dropped
      (2L, 1L, 5L, "buy", 99.0),
      // user 3: email -> ad -> buy(2) : last=ad, first=email
      (3L, 1L, 6L, "email", 0.0), (3L, 2L, 7L, "ad", 0.0),
      (3L, 3L, 8L, "buy", 2.0)
    ).toDF("u", "o", "id", "t", "v")
    val got = Analytics.attribution(df, "u", "o", "id", "t", "v", "buy")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("email", "last")) == ((2L, 15.0)))
    assert(got(("ad", "last")) == ((1L, 2.0)))
    assert(got(("ad", "first")) == ((2L, 15.0)))
    assert(got(("email", "first")) == ((1L, 2.0)))
    assert(got.size == 4)
  }

  // ---- joinDelta ---------------------------------------------------------

  test("joinDelta: maintained join == full recompute, every pair " +
      "produced exactly once") {
    val lOld = Seq((1, "l1"), (2, "l2"), (3, "l3")).toDF("k", "lv")
    val lNew = Seq((2, "l2b"), (4, "l4")).toDF("k", "lv")
    val rOld = Seq((1, "r1"), (2, "r2"), (4, "r4x")).toDF("j", "rv")
    val rNew = Seq((2, "r2b"), (3, "r3")).toDF("j", "rv")
    val base = lOld.join(rOld, lOld("k") === rOld("j"))
    val delta = Analytics.joinDelta(lOld, lNew, rOld, rNew,
      Seq("k"), Seq("j"))
    val maintained = base.unionByName(delta)
      .select("k", "lv", "rv").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    val full = lOld.unionByName(lNew)
      .join(rOld.unionByName(rNew).withColumnRenamed("j", "k"), "k")
      .select("k", "lv", "rv").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    assert(maintained.toSeq == full.toSeq && maintained.nonEmpty)
    // duplicate check: multiset sizes equal (no pair double-produced)
    assert(maintained.length == full.length)
  }

  // ---- decayedValue ------------------------------------------------------

  test("decayedValue: hand-traced horizon, truncation, null-as-zero") {
    val df = Seq((1L, 1L, 1L, Some(1.0)), (1L, 2L, 2L, Some(2.0)),
      (1L, 3L, 3L, Some(4.0)), (1L, 4L, 4L, None),
      (2L, 1L, 5L, Some(8.0)))
      .toDF("u", "o", "id", "v")
    def run(n: Int) = graft.relational.Analytics.decayedValue(
      df, Seq("u"), "o", "id", "v", "dec", alpha = 0.5, lastN = n)
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    val n2 = run(2)
    assert(n2(1L) == 0.5 && n2(2L) == 1.25 && n2(3L) == 2.5)
    assert(n2(4L) == 1.0) // null now, 4.0 one back: 0 + 4*0.25
    assert(n2(5L) == 4.0) // other key unaffected
    val n3 = run(3)
    assert(n3(3L) == 2.625) // horizon reaches the first event
  }

  // ---- funnelWithin ------------------------------------------------------

  test("funnelWithin: step outside the window nulls; within converts") {
    val df = Seq(
      (1L, 0L, "view"), (1L, 100L, "click"), (1L, 300L, "purchase"),
      (2L, 0L, "view"), (2L, 100L, "click"), (2L, 200L, "purchase"),
      (3L, 0L, "view"), (3L, 500L, "click")
    ).toDF("u", "o", "t")
    val got = graft.relational.Analytics.funnelWithin(df, "u", "o", "t",
        Seq("view", "click", "purchase"), windowUs = 150L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == ((Some(0L), Some(100L), None))) // purchase too late
    assert(got(2L) == ((Some(0L), Some(100L), Some(200L))))
    assert(got(3L) == ((Some(0L), None, None))) // click too late
  }

  // ---- topSessionPaths ---------------------------------------------------

  test("topSessionPaths: gap splits sessions, maxSteps caps rendering, " +
      "ties rank path-ascending") {
    val gap = 100L
    val df = Seq(
      // user 1, session 1: a->b ; session 2 (gap 500): a->b
      (1L, 0L, 1L, "a"), (1L, 50L, 2L, "b"),
      (1L, 600L, 3L, "a"), (1L, 650L, 4L, "b"),
      // user 2: one long session a->b->c->d (maxSteps=3 -> a->b->c)
      (2L, 0L, 5L, "a"), (2L, 10L, 6L, "b"), (2L, 20L, 7L, "c"),
      (2L, 30L, 8L, "d"),
      // user 3: single event
      (3L, 0L, 9L, "z")
    ).toDF("u", "o", "id", "t")
    val got = graft.relational.Analytics.topSessionPaths(df, "u", "o",
        "id", "t", gapUs = gap, maxSteps = 3, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a->b", 2L), ("a->b->c", 1L), ("z", 1L)))
  }

  test("topSessionPaths: order within session is (orderCol, tieCol), " +
      "not arrival order") {
    val df = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 5L, 9L, "z"))
      .toDF("u", "o", "id", "t")
    val got = graft.relational.Analytics.topSessionPaths(df, "u", "o",
        "id", "t", gapUs = 1000L, maxSteps = 5, topN = 1)
      .head().getString(0)
    assert(got == "z->a->b")
  }

  // ---- psi ---------------------------------------------------------------

  test("psi: identical snapshots score 0; a shifted snapshot scores the " +
      "hand-computed smoothed value") {
    val ref = (1 to 50).map(_.toDouble).toDF("v")
    val same = graft.relational.Analytics.psi(ref, ref, "v",
      Seq(10.0, 20.0, 30.0, 40.0)).head()
    assert(same.getLong(0) == 50L && same.getLong(1) == 50L)
    assert(same.getDouble(2) == 0.0)
    // shift everything into the top bin
    val cur = (1 to 50).map(_ => 45.0).toDF("v")
    val r = graft.relational.Analytics.psi(ref, cur, "v",
      Seq(10.0, 20.0, 30.0, 40.0)).head()
    val nb = 5
    def frac(c: Long, n: Long) = (c + 0.5) / (n + 0.5 * nb)
    // ref: bins (9, 10, 10, 10, 11); cur: (0, 0, 0, 0, 50)
    val refC = Seq(9L, 10L, 10L, 10L, 11L)
    val curC = Seq(0L, 0L, 0L, 0L, 50L)
    val expect = refC.zip(curC).map { case (a, b) =>
      val (p, q) = (frac(a, 50), frac(b, 50))
      (p - q) * math.log(p / q)
    }.sum
    assert(math.abs(r.getDouble(2) - expect) < 1e-6)
    assert(r.getDouble(2) > 1.0) // grossly shifted
  }

  // ---- cohortValue ---------------------------------------------------------

  test("cohortValue: offsets anchor at each user's first period and the " +
      "cumulative runs per cohort") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 10L, 1.0), (1L, 12L, 2.0), // cohort 10
      (2L, 10L, 3.0),                                 // cohort 10
      (3L, 11L, 7.0), (3L, 13L, 1.0)                  // cohort 11
    ).toDF("u", "day", "v")
    val got = graft.relational.Analytics.cohortValue(df, "u", "day", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map(
      (10L, 0L) -> ((9.0, 9.0)),   // 5+1+3 at offset 0
      (10L, 2L) -> ((2.0, 11.0)),
      (11L, 0L) -> ((7.0, 7.0)),
      (11L, 2L) -> ((1.0, 8.0))))
  }

  // ---- miRanking -----------------------------------------------------------

  test("miRanking: a label-determining feature ranks at ln(k), an " +
      "independent one at 0; per-feature null handling") {
    // f1 == label bijectively (3 levels, MI = ln 3); f2 constant (MI 0);
    // f3 has nulls skipped only for itself
    val rows = (0 until 30).map { i =>
      val l = s"L${i % 3}"
      (l, "const", if (i % 5 == 0) null else "x", l)
    }
    val df = rows.toDF("f1", "f2", "f3", "label")
    val got = graft.relational.Analytics.miRanking(df,
        Seq("f1", "f2", "f3"), "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("f1")._1 == 30L)
    assert(math.abs(got("f1")._2 - math.log(3.0)) < 1e-6)
    assert(got("f2") == ((30L, 0.0)))
    assert(got("f3")._1 == 24L) // 6 nulls skipped for f3 only
    // f3 is constant "x" where present -> MI 0
    assert(got("f3")._2 == 0.0)
  }

  // ---- psiCategorical / ksFromRegisters ----------------------------------

  test("psiCategorical: identical mixes score 0; appearing/disappearing " +
      "categories stay finite via smoothing") {
    val ref = (Seq.fill(30)("a") ++ Seq.fill(20)("b")).toDF("c")
    val same = graft.relational.Analytics.psiCategorical(ref, ref, "c")
      .head()
    assert(same.getLong(0) == 50L && same.getLong(2) == 2L &&
      same.getDouble(3) == 0.0)
    // category "b" vanishes, "z" appears
    val cur = (Seq.fill(30)("a") ++ Seq.fill(20)("z")).toDF("c")
    val r = graft.relational.Analytics.psiCategorical(ref, cur, "c").head()
    assert(r.getLong(2) == 3L)
    assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    assert(r.getDouble(3) > 0.5) // grossly shifted mix
  }

  test("featureAudit: entropy/top-share/cardinality per feature in one " +
      "pass — uniform is ln k, constant is 0, id column has distinct=n") {
    val df = (1 to 40).map(i =>
      (s"v${i % 4}", "const", s"id$i")).toDF("uni", "konst", "id")
    val out = graft.relational.Analytics
      .featureAudit(df, Seq("uni", "konst", "id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("uni").getLong(2) == 4L)
    assert(math.abs(out("uni").getDouble(3) - math.log(4)) < 1e-6)
    assert(out("uni").getDouble(4) == 0.25)
    assert(out("konst").getDouble(3) == 0.0 &&
      out("konst").getDouble(4) == 1.0)
    assert(out("id").getLong(2) == 40L) // id masquerading as a feature
    assert(out.values.forall(_.getLong(1) == 40L))
  }

  test("psiSweep: per-feature PSI equals psiCategorical feature by " +
      "feature") {
    val ref = (1 to 60).map(i => (s"a${i % 3}", s"b${i % 5}"))
      .toDF("f1", "f2")
    val cur = (1 to 60).map(i => (s"a${i % 2}", s"b${i % 5}"))
      .toDF("f1", "f2")
    val sweep = graft.relational.Analytics
      .psiSweep(ref, cur, Seq("f1", "f2"))
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("f1", "f2").foreach { f =>
      val single = graft.relational.Analytics
        .psiCategorical(ref.select(col(f).as("c")),
          cur.select(col(f).as("c")), "c").head()
      assert(sweep(f).getLong(1) == single.getLong(0), f)
      assert(sweep(f).getLong(3) == single.getLong(2), f)
      assert(sweep(f).getDouble(4) == single.getDouble(3), f)
    }
    assert(sweep("f2").getDouble(4) == 0.0) // unchanged mix
  }

  test("ksFromRegisters: identical registers score 0; disjoint value " +
      "masses score ~1; matches a hand ECDF") {
    import graft.relational.Sketches
    val lows = (1 to 50).map(_ => ("g", 10.0)).toDF("grp", "v")
    val highs = (1 to 50).map(_ => ("g", 90.0)).toDF("grp", "v")
    def reg(df: org.apache.spark.sql.DataFrame) =
      Sketches.qSketch(df, Seq("grp"), "v", lo = 0.0, hi = 100.0,
        bins = 10)
    val same = graft.relational.Analytics.ksFromRegisters(reg(lows),
      reg(lows), Seq("grp")).head()
    assert(same.getDouble(1) == 0.0)
    val far = graft.relational.Analytics.ksFromRegisters(reg(lows),
      reg(highs), Seq("grp")).head()
    assert(far.getDouble(1) == 1.0) // full gap at bin 1's edge
    // mixed: A = 50 low; B = 25 low + 25 high -> gap 0.5 at the low edge
    val mixed = lows.limit(25).unionByName(highs.limit(25))
    val half = graft.relational.Analytics.ksFromRegisters(reg(lows),
      reg(mixed), Seq("grp")).head()
    assert(half.getDouble(1) == 0.5)
  }

  // ---- fdViolations ------------------------------------------------------

  test("fdViolations: only violating determinants surface; null " +
      "dependents ignored, a held FD yields empty output") {
    val df = Seq(
      ("a", Some("x")), ("a", Some("x")),          // consistent
      ("b", Some("x")), ("b", Some("y")),          // violation: 2 values
      ("c", Some("z")), ("c", None), ("c", Some("z")) // null ignored -> ok
    ).toDF("det", "dep")
    val got = Analytics.fdViolations(df, Seq("det"), "dep").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("b" -> ((2L, 2L))))
    // a dependency that holds -> empty
    assert(Analytics.fdViolations(
      df.filter(col("det") =!= "b"), Seq("det"), "dep").count() == 0)
  }

  // ---- skyline2 ----------------------------------------------------------

  test("skyline2: keeps exactly the non-dominated rows; " +
      "both-dim ties all survive") {
    val df = Seq(
      ("g", 1, 1, 9), // dominated by (3,2) and (2,3) and (1,5)... x=1,y=9?
      ("g", 3, 2, 0), ("g", 2, 3, 0), ("g", 1, 5, 0),
      ("g", 3, 2, 1), // exact tie of (3,2) -> both survive
      ("g", 2, 2, 0), // dominated by (3,2) and (2,3)
      ("g", 0, 5, 0), // dominated by (1,5)
      ("h", 7, 7, 0)  // separate group: alone -> survives
    ).toDF("g", "d1", "d2", "tag")
    val got = Analytics.skyline2(df, Seq("g"), "d1", "d2")
      .select("g", "d1", "d2").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    // brute-force oracle
    val rows = df.select("g", "d1", "d2").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val expect = rows.filter { case (g, x, y) =>
      !rows.exists { case (g2, x2, y2) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.sorted.toSeq
    assert(got == expect)
    assert(got.count(_ == (("g", 3, 2))) == 2) // tie pair kept twice
    assert(got.contains(("h", 7, 7)))
  }

  test("skyline2: dominance is strict-in-at-least-one; " +
      "(1,9) vs (1,5) on same x keeps only max y") {
    val df = Seq(("g", 1, 9), ("g", 1, 5), ("g", 2, 1))
      .toDF("g", "d1", "d2")
    val got = Analytics.skyline2(df, Seq("g"), "d1", "d2")
      .select("d1", "d2").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(got == Seq((1, 9), (2, 1)))
  }

  // ---- trimmedMean ---------------------------------------------------------

  test("trimmedMean: matches the literal rank-trim on random data and " +
      "shrugs off a planted outlier the plain mean can't") {
    val rnd = new scala.util.Random(42)
    val clean = (1 to 50).map(i => ("g", rnd.nextInt(100).toDouble))
    val outlier = Seq(("g", 1e9))
    val rows = clean ++ outlier
    val got = graft.relational.Analytics.trimmedMean(
      rows.toDF("g", "x"), Seq("g"), "x", trim = 0.1).collect()(0)
    val xs = rows.map(_._2).sorted
    val k = math.floor(0.1 * xs.size).toInt
    val kept = xs.slice(k, xs.size - k)
    assert(got.getLong(1) == xs.size.toLong)
    assert(got.getLong(2) == kept.size.toLong)
    assert(math.abs(got.getDouble(3) - kept.sum / kept.size) < 1e-6)
    assert(got.getDouble(3) < 1000) // robust
    assert(got.getDouble(4) > 1e7) // plain mean dragged by the outlier
  }

  test("percentileBands: nearest-rank order statistics match the " +
      "literal sorted lookup for every group and percentile") {
    val rnd = new scala.util.Random(7)
    val rows = for (g <- Seq("a", "b"); _ <- 1 to (30 + rnd.nextInt(40)))
      yield (g, rnd.nextInt(1000).toDouble)
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val got = graft.relational.Analytics.percentileBands(
      rows.toDF("g", "x"), Seq("g"), "x", ps).collect()
      .map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b")) {
      val xs = rows.filter(_._1 == g).map(_._2).sorted
      val r = got(g)
      assert(r.getLong(1) == xs.size.toLong)
      ps.zipWithIndex.foreach { case (p, i) =>
        val k = math.max(1, math.ceil(p * xs.size).toInt)
        assert(r.getDouble(2 + i) == xs(k - 1), s"$g p$p")
      }
    }
  }

  test("percentileBands: p100 is the max; a single-row group returns " +
      "its value at every percentile") {
    val rows = Seq(("g", 3.0), ("g", 1.0), ("g", 2.0), ("solo", 9.0))
    val got = graft.relational.Analytics.percentileBands(
      rows.toDF("g", "x"), Seq("g"), "x", Seq(0.5, 1.0)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("g").getDouble(3) == 3.0) // p100 = max
    assert(got("g").getDouble(2) == 2.0) // p50 of {1,2,3}
    assert(got("solo").getDouble(2) == 9.0 &&
      got("solo").getDouble(3) == 9.0)
  }

  test("interArrival: gap percentiles, max and last gap match the " +
      "literal computation; single-event keys are omitted") {
    val rnd = new scala.util.Random(5)
    var t = 0L
    val events = Seq("u1", "u2").flatMap { u =>
      t = 0L
      (1 to 25).map { _ => t += 1 + rnd.nextInt(100); (u, t) }
    } ++ Seq(("solo", 42L))
    val got = graft.relational.Analytics.interArrival(
      events.toDF("u", "ts"), Seq("u"), "ts").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!got.contains("solo"))
    for (u <- Seq("u1", "u2")) {
      val ts = events.filter(_._1 == u).map(_._2).sorted
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      val sortedGaps = gaps.sorted
      def at(p: Double) =
        sortedGaps(math.max(1, math.ceil(p * gaps.size).toInt) - 1)
      val r = got(u)
      assert(r.getLong(1) == ts.size.toLong)
      assert(r.getLong(2) == at(0.5) && r.getLong(3) == at(0.9))
      assert(r.getLong(4) == gaps.max && r.getLong(5) == gaps.last)
    }
  }

  test("effectiveSampleSize: equal weights give ess = n; one dominant " +
      "weight collapses the ratio") {
    val eq = graft.relational.Analytics.effectiveSampleSize(
      (1 to 100).map(i => (i, 5.0)).toDF("id", "w"), "w").collect()(0)
    assert(eq.getLong(0) == 100L && eq.getDouble(1) == 100.0 &&
      eq.getDouble(2) == 1.0)
    val dom = graft.relational.Analytics.effectiveSampleSize(
      ((1 to 99).map(i => (i, 1.0)) :+ (100, 10000.0)).toDF("id", "w"),
      "w").collect()(0)
    assert(dom.getDouble(2) < 0.02) // (Σw)²/Σw² ≈ 1 row's worth
  }

  test("kAnonymity: literal group-size audit, nulls are their own " +
      "level, unique rows counted") {
    val rows: Seq[(String, java.lang.Long)] = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), // group of 3: ok at k=3
      ("b", 2L), ("b", 2L), // group of 2: violates k=3
      ("c", null), // null level, unique
      ("d", 7L)) // unique
    val r = graft.relational.Analytics.kAnonymity(
      rows.toDF("seg", "zip"), Seq("seg", "zip"), k = 3).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 1L) // min group
    assert(r.getLong(4) == 3L && r.getLong(5) == 4L) // 3 groups, 4 rows
    assert(r.getDouble(6) == BigDecimal(4.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(7) == 2L) // unique rows
  }

  test("lDiversity: a big-but-homogeneous group violates; diverse " +
      "groups pass") {
    val rows = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "x"), // 4 rows, 1 value
      ("b", "x"), ("b", "y"), ("b", "z"))
    val r = graft.relational.Analytics.lDiversity(
      rows.toDF("qi", "s"), Seq("qi"), "s", l = 2).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L) // min distinct
    assert(r.getLong(3) == 1L && r.getLong(4) == 4L)
    assert(r.getDouble(5) == BigDecimal(4.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("seriesCompleteness: span/observed/longest-run match the " +
      "literal scan; duplicates count once; gapless run is 0") {
    val rows = Seq(
      ("g", 10L), ("g", 11L), ("g", 11L), ("g", 15L), ("g", 16L),
      ("g", 20L), // missing 12-14 (run 3) and 17-19 (run 3)
      ("full", 1L), ("full", 2L), ("full", 3L))
    val got = graft.relational.Analytics.seriesCompleteness(
      rows.toDF("k", "p"), Seq("k"), "p").collect()
      .map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert(g.getLong(1) == 10L && g.getLong(2) == 20L &&
      g.getLong(3) == 11L && g.getLong(4) == 5L)
    assert(g.getDouble(5) == BigDecimal(5.0 / 11)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(g.getLong(6) == 3L)
    val f = got("full")
    assert(f.getDouble(5) == 1.0 && f.getLong(6) == 0L)
  }

  test("duplicateSizeProfile: the size histogram partitions the corpus " +
      "and shares sum to 1") {
    import spark.implicits._
    val docs = Seq("a", "a", "a", "b", "b", "c", "d").map(t => (t, 1))
    val out = graft.text.Dedup.duplicateSizeProfile(
      docs.toDF("text", "x"), Seq("text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 2L, BigDecimal(2.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(2L)._1 == 1L && out(2L)._2 == 2L)
    assert(out(3L)._1 == 1L && out(3L)._2 == 3L)
    assert(out.values.map(_._2).sum == 7L)
  }

  test("standardizedRates: reproduces the textbook Simpson reversal — " +
      "crude favors one group, every stratum favors the other") {
    // Berkeley-style: group a applies to the hard stratum more often
    def rows(g: String, stratum: String, n: Int, succ: Int) =
      (1 to n).map(i => (g, stratum, if (i <= succ) 1L else 0L))
    val data =
      rows("a", "easy", 100, 80) ++ rows("a", "hard", 900, 180) ++
      rows("b", "easy", 900, 650) ++ rows("b", "hard", 100, 10)
    val r = graft.relational.Analytics.standardizedRates(
      data.toDF("g", "s", "y"), "s", "g", "y", "a", "b").collect()(0)
    val crude = r.getDouble(2)
    val adj = r.getDouble(5)
    assert(crude < 0, s"crude $crude") // a looks worse overall
    assert(adj > 0, s"adjusted $adj") // but wins in BOTH strata
    // literal check of the adjusted rates (pooled-mix weights)
    val wEasy = 1000.0; val wHard = 1000.0; val wTot = 2000.0
    val aAdj = (wEasy * 0.8 + wHard * 0.2) / wTot
    val bAdj = (wEasy * (650.0 / 900) + wHard * 0.1) / wTot
    assert(math.abs(r.getDouble(3) - aAdj) < 1e-6)
    assert(math.abs(r.getDouble(4) - bAdj) < 1e-6)
  }

  test("madOutliers: planted outliers flagged, inliers not; zero-MAD " +
      "group flags exactly the non-median rows") {
    val rnd = new scala.util.Random(9)
    val clean = (1 to 100).map(i => ("g", 50.0 + rnd.nextInt(11) - 5))
    val planted = Seq(("g", 500.0), ("g", -400.0))
    val const = (1 to 20).map(_ => ("c", 7.0)) ++ Seq(("c", 9.0))
    val got = graft.relational.Analytics.madOutliers(
      (clean ++ planted ++ const).toDF("g", "x"), Seq("g"), "x", k = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert(g.getLong(4) == 2L, s"outliers ${g.getLong(4)}")
    assert(g.getDouble(2) >= 45 && g.getDouble(2) <= 55) // median sane
    val c = got("c")
    assert(c.getDouble(3) == 0.0 && c.getLong(4) == 1L) // zero MAD
  }

  test("rankMovers: a planted surge climbs to rank 1 with the right " +
      "delta; first periods are omitted; value ties break by key") {
    val rows =
      // period 1: x=100, y=50, z=10 -> ranks x1 y2 z3
      Seq(("x", 1L, 100L), ("y", 1L, 50L), ("z", 1L, 10L),
        // period 2: z surges to 200 -> z1 x2 y3
        ("x", 2L, 90L), ("y", 2L, 40L), ("z", 2L, 200L),
        // period 3: tie between x and y (30) -> breaks by key: x before y
        ("x", 3L, 30L), ("y", 3L, 30L), ("z", 3L, 5L))
    val got = graft.relational.Analytics.rankMovers(
      rows.toDF("item", "p", "v"), Seq("item"), "p", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(!got.contains(("x", 1L)))
    assert(got(("z", 2L)) == ((1L, 3L, -2L))) // surged
    assert(got(("x", 2L)) == ((2L, 1L, 1L)))
    assert(got(("x", 3L)) == ((1L, 2L, -1L))) // tie broken by key
    assert(got(("y", 3L)) == ((2L, 3L, -1L)))
  }

  test("balanceSweep: SMDs match the literal per-feature computation; " +
      "a planted shift shows, a balanced feature stays near 0") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map { i =>
      val g = if (i % 2 == 0) "t" else "c"
      val balanced = rnd.nextInt(100).toDouble
      val shifted = rnd.nextInt(20) + (if (g == "t") 30.0 else 0.0)
      (g, balanced, shifted)
    }
    val got = graft.relational.Analytics.balanceSweep(
      rows.toDF("g", "bal", "shift"), Seq("bal", "shift"), "g", "t", "c")
      .collect().map(r => r.getString(0) -> r).toMap
    def smd(f: (String, Double, Double) => Double): Double = {
      val ta = rows.filter(_._1 == "t").map(r => f(r._1, r._2, r._3))
      val cb = rows.filter(_._1 == "c").map(r => f(r._1, r._2, r._3))
      def m(x: Seq[Double]) = x.sum / x.size
      def v(x: Seq[Double]) = {
        val mm = m(x); x.map(d => (d - mm) * (d - mm)).sum / (x.size - 1)
      }
      (m(ta) - m(cb)) / math.sqrt((v(ta) + v(cb)) / 2)
    }
    assert(math.abs(got("bal").getDouble(5) - smd((_, b, _) => b)) < 1e-5)
    assert(math.abs(got("shift").getDouble(5) -
      smd((_, _, s) => s)) < 1e-5)
    assert(math.abs(got("bal").getDouble(5)) < 0.2)
    assert(got("shift").getDouble(5) > 2)
  }

  test("weightedPercentiles: matches the literal cumulative-mass lookup " +
      "and differs from the unweighted median when mass is skewed") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map { _ =>
      val v = rnd.nextInt(100).toDouble
      ("g", v, 1L + (v / 10).toLong) // heavier weights at high values
    }
    val got = graft.relational.Analytics.weightedPercentiles(
      rows.toDF("g", "x", "w"), Seq("g"), "x", "w").collect()(0)
    val sorted = rows.sortBy(_._2)
    val total = rows.map(_._3).sum
    def lit(p: Double): Double = {
      var cw = 0L
      sorted.find { r => cw += r._3; cw >= p * total }.get._2
    }
    assert(got.getLong(1) == total)
    assert(got.getDouble(2) == lit(0.25))
    assert(got.getDouble(3) == lit(0.5))
    assert(got.getDouble(4) == lit(0.75))
    // mass skew: weighted median above the unweighted one
    val plain = sorted(99)._2
    assert(got.getDouble(3) > plain)
  }

  test("audienceOverlap: exact Jaccard/containment per pair, duplicate " +
      "events collapse, canonical pair order") {
    val events = Seq(
      ("view", 1L), ("view", 1L), ("view", 2L), ("view", 3L),
      ("buy", 2L), ("buy", 3L), ("buy", 4L),
      ("search", 9L)) // disjoint from the others
    val got = graft.relational.Analytics.audienceOverlap(
      events.toDF("t", "u"), "t", "u").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))).toMap
    // buy={2,3,4}, view={1,2,3}: ∩=2, ∪=4 -> jac .5, cont 2/3
    assert(got(("buy", "view"))._3 == 2L)
    assert(got(("buy", "view"))._4 == 0.5)
    assert(got(("buy", "view"))._5 == BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!got.contains(("view", "buy"))) // canonical order only
    assert(!got.contains(("buy", "search"))) // no shared users, no row
  }

  test("churnLabels: features stop at the cutoff, labels come only " +
      "from the outcome window, label-window-only keys are excluded") {
    // max t = 100, horizon 20 -> cutoff 80
    val events = Seq(
      ("stay", 10L), ("stay", 70L), ("stay", 95L), // active after
      ("churn", 5L), ("churn", 60L), // silent after
      ("leak", 85L), ("leak", 100L)) // first seen AFTER cutoff
    val got = graft.relational.Analytics.churnLabels(
      events.toDF("u", "t"), Seq("u"), "t", horizon = 20L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!got.contains("leak"))
    val s = got("stay")
    assert(s.getLong(1) == 2L && s.getLong(2) == 10L &&
      s.getLong(3) == 70L && s.getLong(4) == 10L &&
      s.getLong(5) == 1L)
    val c = got("churn")
    assert(c.getLong(1) == 2L && c.getLong(4) == 20L &&
      c.getLong(5) == 0L)
  }

  test("rfmSegments: quintile scores match the literal nearest-rank " +
      "boundaries; the best customer codes 555 and the worst 111") {
    val rnd = new scala.util.Random(17)
    val orders = (1 to 500).flatMap { cust =>
      val n = 1 + rnd.nextInt(9)
      (1 to n).map(_ => (cust.toLong, (1000 + rnd.nextInt(5000)).toLong,
        10.0 + rnd.nextInt(990)))
    } ++
      // a whale: newest, most frequent, biggest spend
      (1 to 50).map(_ => (9999L, 99999L, 10000.0)) ++
      // a dud: single ancient tiny order
      Seq((8888L, 1L, 0.01))
    val got = graft.relational.Analytics.rfmSegments(
      orders.toDF("c", "d", "amt"), "c", "d", "amt").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(9999L).getString(7) == "555")
    assert(got(8888L).getString(7) == "111")
    // literal boundary check on the frequency dimension
    val freqs = orders.groupBy(_._1).values.map(_.size.toLong).toSeq.sorted
    val n = freqs.size
    val bs = Seq(0.2, 0.4, 0.6, 0.8).map(p =>
      freqs((math.ceil(p * n) - 1).toInt))
    got.values.foreach { r =>
      val expected = 1 + bs.count(_ < r.getLong(2))
      assert(r.getInt(5) == expected, s"cust ${r.getLong(0)} f_score")
    }
  }

  test("trimmedMean: trim 0 equals the plain mean; ties trim cleanly") {
    val rows = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 1.0),
      ("g", 9.0))
    val zero = graft.relational.Analytics.trimmedMean(
      rows.toDF("g", "x"), Seq("g"), "x", trim = 0.0).collect()(0)
    assert(zero.getDouble(3) == zero.getDouble(4))
    val t = graft.relational.Analytics.trimmedMean(
      rows.toDF("g", "x"), Seq("g"), "x", trim = 0.2).collect()(0)
    assert(t.getLong(2) == 3L && t.getDouble(3) == 5.0)
  }
}
