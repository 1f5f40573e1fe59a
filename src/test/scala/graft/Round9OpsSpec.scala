package graft

import org.apache.spark.sql.functions._

import graft.operators.FeatureHasher
import graft.relational.{Analytics, Eval, Graph}

/** Round-9 operators: deterministic label propagation, t-closeness,
  * the hashing-trick encoder, integer-exact EWMA, and HBOS density
  * outliers. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- labelPropagation -------------------------------------------------

  private def lpa(edges: Seq[(String, String)], rounds: Int = 5)
      : Map[String, String] =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two triangles joined by a bridge resolve to two communities") {
    val got = lpa(Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")))
    // each triangle's min label wins inside the triangle
    assert(got("a") == got("b") && got("b") == got("c"))
    assert(got("x") == got("y") && got("y") == got("z"))
    assert(got("a") != got("x"))
  }

  test("a clique converges to its minimum node id") {
    val clique = for {
      a <- Seq("m", "n", "o", "p"); b <- Seq("m", "n", "o", "p")
      if a < b
    } yield (a, b)
    val got = lpa(clique)
    assert(got.values.toSet == Set("m"))
  }

  test("fixpoint short-circuit: extra rounds change nothing") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"))
    assert(lpa(edges, rounds = 3) == lpa(edges, rounds = 30))
  }

  test("self-loops and direction are ignored") {
    val got = lpa(Seq(("a", "a"), ("b", "a"), ("a", "b")))
    assert(!got.contains("a") || got("a") == got("b"))
    assert(got.keySet == Set("a", "b"))
  }

  // ---- tCloseness -------------------------------------------------------

  test("tCloseness: hand-computed EMD on a two-value attribute") {
    // global: x=3, y=1 (N=4, m=2); group A = (x,x): p=(1,0) vs
    // q=(.75,.25) -> EMD .25; group B = (x,y): p=(.5,.5) -> EMD .25
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"))
      .toDF("g", "s")
    val r = Analytics.tCloseness(df, Seq("g"), "s", t = 0.2).head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("m_values") == 2L)
    assert(math.abs(r.getAs[Double]("max_emd") - 0.25) < 1e-12)
    assert(r.getAs[Long]("violating_groups") == 2L)
    assert(r.getAs[Long]("violating_rows") == 4L)
    assert(math.abs(r.getAs[Double]("violating_share") - 1.0) < 1e-12)
  }

  test("tCloseness: a group mirroring the global distribution scores 0") {
    val df = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("g", "s")
    val r = Analytics.tCloseness(df, Seq("g"), "s", t = 0.1).head()
    assert(r.getAs[Double]("max_emd") == 0.0)
    assert(r.getAs[Long]("violating_groups") == 0L)
  }

  // ---- FeatureHasher ----------------------------------------------------

  test("FeatureHasher: one categorical feature puts exactly one ±1") {
    val df = Seq(("r1", "alpha"), ("r2", "beta"), ("r3", null))
      .toDF("id", "cat")
    val out = new FeatureHasher(Seq("cat"), Nil, "fh", 16)
      .transform(df).select("id", "fh").as[(String, Seq[Double])]
      .collect().toMap
    assert(out("r1").length == 16)
    assert(out("r1").map(math.abs).sum == 1.0)
    assert(out("r2").map(math.abs).sum == 1.0)
    assert(out("r3").forall(_ == 0.0)) // null contributes nothing
  }

  test("FeatureHasher: numeric feature carries its value; deterministic") {
    val df = Seq(("r1", 2.5), ("r2", -1.25)).toDF("id", "v")
    val h = new FeatureHasher(Nil, Seq("v"), "fh", 8)
    val a = h.transform(df).select("id", "fh").as[(String, Seq[Double])]
      .collect().toMap
    val b = h.transform(df).select("id", "fh").as[(String, Seq[Double])]
      .collect().toMap
    assert(a == b) // md5, not a run-keyed RNG
    assert(a("r1").map(math.abs).sum == 2.5)
    // same slot for both rows (the feature NAME owns the slot)
    assert(a("r1").indexWhere(_ != 0.0) == a("r2").indexWhere(_ != 0.0))
  }

  test("FeatureHasher: identical inputs hash to identical vectors") {
    val df = Seq(("r1", "u9", 3.0), ("r2", "u9", 3.0))
      .toDF("id", "cat", "v")
    val out = new FeatureHasher(Seq("cat"), Seq("v"), "fh", 32)
      .transform(df).select("fh").as[Seq[Double]].collect()
    assert(out(0) == out(1))
  }

  // ---- ewma -------------------------------------------------------------

  private def ewmaOf(xs: Seq[Double], num: Int, k: Int): Seq[Double] = {
    val df = xs.zipWithIndex.map { case (x, i) => ("k1", i.toLong, x) }
      .toDF("key", "o", "x")
    Eval.ewma(df, Seq("key"), "o", "x", alphaNum = num, k = k)
      .orderBy("o").select("ewma").as[Double].collect().toSeq
  }

  test("ewma alpha=1/2 replays the hand recurrence") {
    assert(ewmaOf(Seq(4.0, 8.0, 8.0), 1, 1) == Seq(4.0, 6.0, 7.0))
  }

  test("ewma alpha=1/4 floors in integer units") {
    // s2 = 0 + ((1*2^20 - 0) * 1) >> 2 = 262144 units = 0.25
    assert(ewmaOf(Seq(0.0, 1.0), 1, 2) == Seq(0.0, 0.25))
  }

  test("ewma keys are independent and null values drop") {
    val df = Seq(("a", 0L, Some(2.0)), ("a", 1L, None),
      ("a", 2L, Some(4.0)), ("b", 0L, Some(10.0)))
      .toDF("key", "o", "x")
    val got = Eval.ewma(df, Seq("key"), "o", "x", 1, 1)
      .orderBy("key", "o")
      .select("key", "ewma").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 2.0), ("a", 3.0), ("b", 10.0)))
  }

  test("ewma converges toward a constant tail") {
    val xs = Seq(0.0) ++ Seq.fill(40)(100.0)
    val out = ewmaOf(xs, 1, 2)
    assert(out.head == 0.0)
    assert(out.last > 99.99) // floor leak stays sub-unit
    assert(out == out.sorted) // monotone toward the plateau
  }

  // ---- histogramOutliers ------------------------------------------------

  test("histogramOutliers ranks the sparse-bin row first") {
    val df = Seq((1L, 5.0, 1.0), (2L, 5.0, 1.0), (3L, 5.0, 1.0),
      (4L, 5.0, 1.0), (5L, 100.0, 1.0)).toDF("id", "f1", "f2")
    val got = Analytics.histogramOutliers(df, "id", Seq("f1", "f2"),
      nBins = 4, topN = 2).collect()
    assert(got(0).getAs[Long]("id") == 5L)
    assert(got(0).getAs[Double]("score") == 5.0)  // 1 (f1) * 5 (f2)
    assert(got(1).getAs[Double]("score") == 20.0) // 4 * 5
  }

  test("histogramOutliers drops incomplete rows and keeps the cut exact") {
    val df = Seq((1L, Some(1.0), 1.0), (2L, None, 1.0),
      (3L, Some(1.0), 1.0)).toDF("id", "f1", "f2")
    val got = Analytics.histogramOutliers(df, "id", Seq("f1", "f2"),
      nBins = 2, topN = 10).collect()
    assert(got.map(_.getAs[Long]("id")).toSet == Set(1L, 3L))
    // ties broken by id ascending
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L))
  }

  test("histogramOutliers: every row filtered out returns an EMPTY " +
      "frame with the output schema, not a crash (ADVICE r7)") {
    val df = Seq((1L, Option.empty[Double], 1.0),
      (2L, Some(Double.NaN), 2.0)).toDF("id", "f1", "f2")
    val got = Analytics.histogramOutliers(df, "id", Seq("f1", "f2"),
      nBins = 4, topN = 5)
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("id", "bin_f1", "bin_f2", "score"))
  }

  test("histogramOutliers: a quantized range that would overflow the " +
      "Long bin product fails loudly instead of wrapping (ADVICE r7)") {
    // spread ~2.3e9 quantizes (×2^20) to ~2.4e15 > 2^63/4096 ≈ 2.25e15
    val df = Seq((1L, 0.0), (2L, 2.3e9)).toDF("id", "f1")
    val e = intercept[IllegalArgumentException] {
      Analytics.histogramOutliers(df, "id", Seq("f1"), nBins = 4096,
        topN = 2).collect()
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("CUPED: hand-computed theta and adjusted means; treatment effect " +
      "shifts only by the covariate imbalance") {
    // n=4, sx=20, sy=100, sxx=120, sxy=460 -> varX=80, theta=-2, mxg=5
    val units = Seq(("a", 10L, 4L), ("a", 20L, 8L),
      ("b", 30L, 6L), ("b", 40L, 2L)).toDF("variant", "y", "x")
    val got = Analytics.cuped(units, "variant", "y", "x")
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    assert(got("a").getAs[Double]("theta") == -2.0)
    assert(got("a").getAs[Double]("mean_metric") == 15.0)
    assert(got("a").getAs[Double]("mean_adjusted") == 17.0)
    assert(got("b").getAs[Double]("mean_adjusted") == 33.0)
    assert(got("b").getAs[Long]("n_units") == 2L)
  }

  test("CUPED: constant covariate means theta = 0 and adjusted == raw") {
    val units = Seq(("a", 10L, 7L), ("b", 30L, 7L), ("b", 50L, 7L))
      .toDF("variant", "y", "x")
    val got = Analytics.cuped(units, "variant", "y", "x").collect()
    got.foreach { r =>
      assert(r.getAs[Double]("theta") == 0.0)
      assert(r.getAs[Double]("mean_adjusted") ==
        r.getAs[Double]("mean_metric"))
    }
  }

  test("tCloseness: a single sensitive value (m = 1) reports the true " +
      "group counts with EMD 0, not n_groups = 0 (ADVICE r7)") {
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x")).toDF("g", "s")
    val r = Analytics.tCloseness(df, Seq("g"), "s", t = 0.2).head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("m_values") == 1L)
    assert(r.getAs[Double]("max_emd") == 0.0)
    assert(r.getAs[Long]("violating_groups") == 0L)
    assert(r.getAs[Double]("violating_share") == 0.0)
  }

  test("FeatureHasher batch side accepts any categorical type — " +
      "cast(string) is self-consistent at fit and transform; the " +
      "rendering-parity refusal lives at the OnlineScorer boundary " +
      "(ADVICE r8 revision of the r7 require)") {
    val df = Seq((1L, 1.0e7)).toDF("id", "c")
    val out = new FeatureHasher(Seq("c"), Nil, "fh", 16).transform(df)
      .select("fh").head().getSeq[Double](0)
    assert(out.length == 16 && out.map(math.abs).sum == 1.0)
  }
}

class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.Streaming

  test("ewmaStream == batch ewma after every micro-batch, unit for unit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(9)
    def mk(lo: Int, n: Int, o0: Long) = Seq.tabulate(n)(i =>
      Streaming.EwmaEvent(s"k${i % 3}", o0 + i,
        lo + rng.nextInt(1000) / 8.0))
    val batch1 = mk(100, 45, 0L)
    val batch2 = mk(400, 30, 1000L)

    val mem = MemoryStream[Streaming.EwmaEvent]
    val q = Streaming.ewmaStream(mem.toDS(), alphaNum = 1, k = 2)
      .writeStream.outputMode("update").format("memory")
      .queryName("ewma_s").start()
    def streamRows() = spark.table("ewma_s")
      .select("key", "o", "ewma_units", "ewma")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def batchRows(evs: Seq[Streaming.EwmaEvent]) =
      graft.relational.Eval.ewma(
          evs.map(e => (e.key, e.o, e.x)).toDF("key", "o", "x"),
          Seq("key"), "o", "x", alphaNum = 1, k = 2)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getAs[Long]("ewma_units"), r.getAs[Double]("ewma"))).toMap
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      assert(streamRows() == batchRows(batch1)) // peek mid-stream
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(streamRows() == batchRows(batch1 ++ batch2))
  }

  test("ewmaStream state is one long: NaN drops, first value seeds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.EwmaEvent]
    val q = Streaming.ewmaStream(mem.toDS(), alphaNum = 1, k = 1)
      .writeStream.outputMode("update").format("memory")
      .queryName("ewma_s2").start()
    try {
      mem.addData(Streaming.EwmaEvent("a", 0L, 4.0),
        Streaming.EwmaEvent("a", 1L, Double.NaN),
        Streaming.EwmaEvent("a", 2L, 8.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_s2").orderBy("o")
      .select("ewma").as[Double].collect().toSeq
    assert(got == Seq(4.0, 6.0))
  }
}

/** Plan-shape pins for the round-9 operators (the AnalyticsPlanSpec
  * discipline: shuffle counts and killer-node absences asserted so a
  * regression can't land silently). */
class Round9PlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(p: String): Int = p.sliding(9).count(_ == "Exchange ")

  test("FeatureHasher is a pure projection: no exchange, join, or window") {
    val df = Seq(("r1", "a", 1.0)).toDF("id", "cat", "v")
    val p = plan(new FeatureHasher(Seq("cat"), Seq("v"), "fh", 16)
      .transform(df))
    assert(exchanges(p) == 0, p.take(500))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(500))
  }

  test("ewma is ONE key aggregate: one exchange, no join, no window") {
    val df = Seq(("k", 0L, 1.0), ("k", 1L, 2.0)).toDF("key", "o", "x")
    val p = plan(Eval.ewma(df, Seq("key"), "o", "x"))
    assert(exchanges(p) <= 2, p.take(600))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(600))
  }

  test("histogramOutliers: no cartesian, no join at all (literal-map " +
      "scoring), bounded TakeOrdered cut") {
    val df = (1 to 40).map(i => (i.toLong, i * 1.0, i * 2.0))
      .toDF("id", "f1", "f2")
    val p = plan(Analytics.histogramOutliers(df, "id", Seq("f1", "f2"),
      nBins = 4, topN = 5))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("Join"), p.take(600))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("tCloseness: the value grid rides a BROADCAST, never a shuffled " +
      "cartesian; windows partition by the QI keys") {
    val df = Seq(("A", "x"), ("B", "y")).toDF("g", "s")
    val p = plan(Analytics.tCloseness(df, Seq("g"), "s"))
    assert(!p.contains("CartesianProduct"), p.take(700))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(700))
  }
}

class RrfSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.Ranking

  test("rrfFuse: hand-computed fusion, absent ids contribute zero") {
    val a = Seq(("x", 1), ("y", 2)).toDF("id", "rank")
    val b = Seq(("y", 1), ("z", 2)).toDF("id", "rank")
    val got = Ranking.rrfFuse(Seq(a, b), Nil, "id", kk = 60)
      .orderBy("fused_rank").collect()
    assert(got.map(_.getAs[String]("id")).toSeq == Seq("y", "x", "z"))
    assert(got(0).getAs[Double]("rrf_score") == 1.0 / 62 + 1.0 / 61)
    assert(got(1).getAs[Double]("rrf_score") == 1.0 / 61)
    assert(got(1).isNullAt(got(1).fieldIndex("rank_1"))) // x absent in b
    assert(got.map(_.getAs[Long]("fused_rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("rrfFuse: score ties break by id ascending") {
    // mirrored ranks give x and y the identical score 1/61 + 1/62
    val a = Seq(("y", 1), ("x", 2)).toDF("id", "rank")
    val b = Seq(("x", 1), ("y", 2)).toDF("id", "rank")
    val rows = Ranking.rrfFuse(Seq(a, b), Nil, "id")
      .orderBy("fused_rank")
      .select("id", "rrf_score").as[(String, Double)].collect()
    assert(rows(0)._2 == rows(1)._2) // exact tie
    assert(rows.map(_._1).toSeq == Seq("x", "y"))
  }

  test("rrfFuse: per-query grouping fuses queries independently") {
    val a = Seq(("q1", "x", 1), ("q2", "y", 1)).toDF("q", "id", "rank")
    val b = Seq(("q1", "x", 2), ("q2", "z", 1)).toDF("q", "id", "rank")
    val got = Ranking.rrfFuse(Seq(a, b), Seq("q"), "id")
      .select("q", "id", "fused_rank").as[(String, String, Long)]
      .collect().toSet
    assert(got == Set(("q1", "x", 1L), ("q2", "y", 1L), ("q2", "z", 2L)))
  }
}

class IvfAddSpec extends SparkSpec {
  import spark.implicits._
  import graft.sim.{IvfIndex, Similarity}

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, Array.tabulate(8)(j =>
      math.sin(i * 7 + j).abs + 0.1))).toDF("id", "v")

  test("fit-half + add-half at full probe == brute force over the union") {
    val all = vecs(0 until 60)
    val qs = vecs(0 until 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val idx = IvfIndex.fit(all.filter(col("id") % 2 === 0), "id", "v",
        nCentroids = 4)
      .add(all.filter(col("id") % 2 === 1))
    val got = idx.query(qs, "qid", "qv", k = 5, nProbe = 4)
      .select("qid", "id", "rank").as[(Long, Long, Long)].collect().toSet
    val exp = Similarity.bruteForceTopK(all, "id", "v", qs, "qid", "qv", 5)
      .select("qid", "id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(got == exp)
    idx.release()
  }

  test("re-adding the same batch is idempotent and replaces, not appends") {
    val base = vecs(0 until 20)
    val more = vecs(20 until 30)
    val idx1 = IvfIndex.fit(base, "id", "v", nCentroids = 2).add(more)
    val n1 = idx1.assigned.count()
    val idx2 = idx1.add(more) // replay the ingest batch
    assert(idx2.assigned.count() == n1)
    assert(idx2.assigned.select("id").distinct().count() == 30)
    idx2.release()
  }
}

class MonotonicBinsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Scorecard

  test("already-monotone rates pool per pre-bin; iso_rate non-decreasing") {
    // rates by value band: 0.0, 0.5, 1.0 — isotonic leaves them alone
    val rows = Seq.fill(10)((0.05, 0)) ++
      Seq.fill(10)((0.45, 0)).zipWithIndex.map { case ((v, _), i) =>
        (v, i % 2) } ++ Seq.fill(10)((0.95, 1))
    val df = rows.toDF("x", "y")
    val got = Scorecard.monotonicBins(df, "x", "y", nPreBins = 4)
      .orderBy("pool").collect()
    val isoRates = got.map(_.getAs[Double]("iso_rate")).toSeq
    assert(isoRates == isoRates.sorted)
    assert(isoRates.head == 0.0 && isoRates.last == 1.0)
  }

  test("a rate violation pools into one bin with the weighted-average " +
      "rate") {
    // band A rate 1.0 then band B rate 0.0 (a violation): PAV pools
    // them to (10+0)/(10+10) = 0.5
    val rows = Seq.fill(10)((0.1, 1)) ++ Seq.fill(10)((0.9, 0))
    val got = Scorecard.monotonicBins(rows.toDF("x", "y"), "x", "y",
      nPreBins = 2).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Double]("iso_rate") == 0.5)
    assert(got(0).getAs[Long]("n") == 20L)
    assert(got(0).getAs[Long]("bin_lo") == 0L)
    assert(got(0).getAs[Long]("bin_hi") == 1L)
  }

  test("decreasing=true fits the reversed order") {
    // risk FALLS as x rises: decreasing fit keeps the two bins apart
    val rows = Seq.fill(10)((0.1, 1)) ++ Seq.fill(10)((0.9, 0))
    val got = graft.relational.Scorecard.monotonicBins(
      rows.toDF("x", "y"), "x", "y", nPreBins = 2, decreasing = true)
      .orderBy("bin_lo").collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Double]("iso_rate")).toSeq == Seq(1.0, 0.0))
  }

  test("woe orders opposite to iso_rate across pools") {
    val rng = new scala.util.Random(4)
    val rows = (0 until 400).map { i =>
      val x = i / 400.0
      (x, if (rng.nextDouble() < x) 1 else 0)
    }
    val got = Scorecard.monotonicBins(rows.toDF("x", "y"), "x", "y",
      nPreBins = 8).orderBy("pool").collect()
    val woes = got.map(_.getAs[Double]("woe")).toSeq
    assert(woes == woes.sorted.reverse) // higher rate -> lower WOE
  }
}

class FeatureHasherLifecycleSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators._

  private val df = Seq(("r1", "alpha", 2.5), ("r2", "beta", -1.25),
    ("r3", null.asInstanceOf[String], 3.0)).toDF("id", "cat", "v")

  test("FeatureHasher survives save/load bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("fh").toString
    val model = DFPipeline(new FeatureHasher(Seq("cat"), Seq("v"),
      "fh", 16)).fit(df)
    GraftPersistence.save(model, dir)
    val reloaded = GraftPersistence.load(spark, dir)
    val a = model.transform(df).select("id", "fh")
      .as[(String, Seq[Double])].collect().toMap
    val b = reloaded.transform(df).select("id", "fh")
      .as[(String, Seq[Double])].collect().toMap
    assert(a == b)
  }

  test("FeatureHasher online scoring equals batch transform per row") {
    val model = DFPipeline(new FeatureHasher(Seq("cat"), Seq("v"),
      "fh", 16)).fit(df)
    val score = OnlineScorer.compile(model)
    val batch = model.transform(df).select("id", "fh")
      .as[(String, Seq[Double])].collect().toMap
    df.collect().foreach { r =>
      val row: OnlineScorer.OnlineRow = df.columns
        .map(c => c -> r.getAs[Any](c)).toMap
      val online = score(row)("fh").asInstanceOf[Seq[Double]]
      assert(online == batch(r.getAs[String]("id")),
        s"row ${r.getAs[String]("id")}")
    }
  }
}
