package graft

import org.apache.spark.sql.functions._

/** Round-8 property suites: algebraic invariants the hand-case specs
  * can't pin — label symmetry, translation invariance, brute-force
  * equivalence, noise scaling. */
class BestSplitPropsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Scorecard

  test("label inversion leaves the chosen threshold and gain unchanged " +
      "(Gini is symmetric in the classes)") {
    val rng = new scala.util.Random(8)
    val rows = Seq.tabulate(200)(_ =>
      (rng.nextInt(20).toDouble, rng.nextInt(2)))
    val df = rows.toDF("x", "y")
    val inv = rows.map { case (x, y) => (x, 1 - y) }.toDF("x", "y")
    val a = Scorecard.bestSplits(df, Seq("x"), "y").collect()(0)
    val b = Scorecard.bestSplits(inv, Seq("x"), "y").collect()(0)
    assert(a.getDouble(1) == b.getDouble(1)) // threshold
    assert(a.getDouble(6) == b.getDouble(6)) // gain
    // sides swap class counts: n_left equal, pos_left complements
    assert(a.getLong(2) == b.getLong(2))
    assert(a.getLong(3) + b.getLong(3) == a.getLong(2))
  }

  test("a pure-noise label yields a small gain; a perfectly separable " +
      "one yields the parent impurity") {
    val sep = Seq.tabulate(100)(i => (i.toDouble, if (i < 50) 0 else 1))
      .toDF("x", "y")
    val r = Scorecard.bestSplits(sep, Seq("x"), "y").collect()(0)
    assert(r.getDouble(1) == 49.0 && r.getDouble(6) == 0.5)
  }
}

class DecomposePropsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Eval

  private def series(vs: Seq[Double]) =
    vs.zipWithIndex.map { case (v, i) => ("s", (i + 1).toLong, v) }
      .toDF("k", "t", "v")

  test("adding a constant + linear ramp shifts only the trend: " +
      "seasonal and residual are translation/detrend invariant") {
    // whole-unit values so the cents quantization is float-exact on
    // both series (29.61*100 floors to 2960 — the fixture, not the
    // operator, must stay off representation edges)
    val rng = new scala.util.Random(42)
    val base = Seq.tabulate(20)(_ => rng.nextInt(1000).toDouble)
    val ramped = base.zipWithIndex.map { case (v, i) =>
      v + 7.0 + i * 3.0 } // +7 units, +3 units per step
    def parts(vs: Seq[Double]) = Eval.decompose(
        series(vs), Seq("k"), "t", "v", season = 5)
      .orderBy("t").collect()
      .map(r => (if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5))).toSeq
    assert(parts(base) == parts(ramped))
  }

  test("a period-`season` periodic series has zero residual everywhere " +
      "(the seasonal component absorbs it exactly)") {
    val pattern = Seq(1.0, 4.0, 2.0, 5.0, 3.0)
    val vs = Seq.tabulate(25)(i => pattern(i % 5))
    val rows = Eval.decompose(series(vs), Seq("k"), "t", "v", season = 5)
      .filter(col("residual").isNotNull).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(5) == 0.0, r))
  }
}

class GeoPropsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Geo

  test("grid join == brute force on a random point cloud (the oracle's " +
      "argument, as a property)") {
    val rng = new scala.util.Random(88)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, (rng.nextInt(2000) - 1000).toLong,
        (rng.nextInt(2000) - 1000).toLong))
    val df = pts.toDF("id", "lat", "lon")
    val r = 150
    val grid = Geo.distanceJoin(df, "id", "lat", "lon", r)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      dy = a._2 - b._2; dx = a._3 - b._3
      if dy * dy + dx * dx <= r.toLong * r
    } yield (a._1, b._1)).toSet
    assert(grid == brute)
  }

  test("nearestSite agrees with the brute-force argmin under the " +
      "(dist, site) total order") {
    val rng = new scala.util.Random(7)
    val pts = Seq.tabulate(100)(i =>
      (i.toLong, rng.nextInt(500).toLong, rng.nextInt(500).toLong))
    val sites = Seq.tabulate(12)(i =>
      (i.toLong, rng.nextInt(500).toLong, rng.nextInt(500).toLong))
    val r = 200
    val got = Geo.nearestSite(pts.toDF("id", "lat", "lon"),
        sites.toDF("sid", "lat", "lon"), "id", "sid", "lat", "lon", r)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    val brute = pts.flatMap { case (id, la, lo) =>
      val cand = sites.flatMap { case (sid, sla, slo) =>
        val d2 = (la - sla) * (la - sla) + (lo - slo) * (lo - slo)
        if (d2 <= r.toLong * r) Some((d2, sid)) else None
      }
      if (cand.isEmpty) None else Some(id -> {
        val best = cand.min; (best._2, best._1) })
    }.toMap
    assert(got == brute)
  }
}

class PrivacyPropsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Privacy

  test("noise scales exactly as 1/epsilon for the same tagged draw") {
    val df = Seq.fill(100)("g").toDF("g")
    def noise(eps: Double): Double =
      Privacy.dpCounts(df, Seq("g"), eps, "scale-prop")
        .collect()(0).getDouble(1) - 100.0
    val n1 = noise(1.0)
    val n4 = noise(4.0)
    // same uniform, b halves twice: ratio is exactly 4 up to the 6-dp
    // output rounding of each release
    assert(math.abs(n1 - 4.0 * n4) < 4e-6, s"$n1 vs $n4")
  }

  test("dpSums is monotone in the clip ceiling for over-ceiling data") {
    val df = Seq(("g", 500.0), ("g", 700.0)).toDF("grp", "v")
    def rel(hi: Double) = Privacy.dpSums(df, Seq("grp"), "v", 0.0, hi,
      1.0, "mono").collect()(0).getDouble(1)
    // same tag => same uniform; b grows with hi, but the clipped mass
    // grows by exactly (hi2-hi1)*2 between ceilings below the data
    val a = rel(100.0); val b = rel(200.0)
    assert(b > a, s"$b vs $a")
  }
}

class BackoffPropsSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.Ranking

  test("per-doc scores are independent of what else is in the score set") {
    val train = Seq((1L, "a b c d"), (2L, "b c e")).toDF("doc_id", "text")
    val alone = Ranking.stupidBackoffScore(train,
        Seq((9L, "a b c")).toDF("doc_id", "text"), "text", "doc_id")
      .collect()(0).getDouble(2)
    val crowd = Ranking.stupidBackoffScore(train,
        Seq((9L, "a b c"), (10L, "x y z w"), (11L, "c e b a"))
          .toDF("doc_id", "text"), "text", "doc_id")
      .filter(col("doc_id") === 9L).collect()(0).getDouble(2)
    assert(alone == crowd)
  }

  test("self-scored training text never backs off below the trigram " +
      "level: every score is a plain count ratio > alpha floor cases") {
    val train = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = Ranking.stupidBackoffScore(train, train, "text", "doc_id")
      .collect()(0)
    // 4 trigrams, each unique with unique prefix: ln(1/1) = 0
    assert(r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.0)
  }
}

class MsprtStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.Streaming
  import graft.relational.Scorecard

  test("msprtStream == batch msprt after every micro-batch (peeking is " +
      "the point)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(3)
    val batch1 = Seq.tabulate(60)(i =>
      Streaming.MsprtEvent(s"g${i % 2}", 4800 + rng.nextInt(500)))
    val batch2 = Seq.tabulate(40)(i =>
      Streaming.MsprtEvent(s"g${i % 2}", 5100 + rng.nextInt(300)))

    val mem = MemoryStream[Streaming.MsprtEvent]
    val q = Streaming.msprtStream(mem.toDS(), tau = 100.0, theta0 = 5000.0)
      .writeStream.outputMode("update").format("memory")
      .queryName("msprt_s").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()

      // after batch 1: stream state == batch msprt over batch1 alone
      val mid = spark.table("msprt_s")
        .groupBy("group").agg(max_by(struct(col("n"), col("lambda"),
          col("p_value")), col("n")).as("r"))
        .select("group", "r.n", "r.lambda", "r.p_value").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap
      val bMid = Scorecard.msprt(
        batch1.map(e => (e.group, e.value)).toDF("grp", "v"),
        Seq("grp"), "v", 100.0, 5000.0).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4),
          r.getDouble(5))).toMap
      mid.foreach { case (g, (n, lam, p)) =>
        val (bn, blam, bp) = bMid(g)
        assert(n == bn)
        assert(math.abs(lam - blam) < 5e-7, s"$g: $lam vs $blam")
        assert(math.abs(p - bp) < 5e-7)
      }

      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val fin = spark.table("msprt_s")
      .groupBy("group").agg(max_by(struct(col("n"), col("lambda"),
        col("p_value")), col("n")).as("r"))
      .select("group", "r.n", "r.lambda", "r.p_value").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val bFin = Scorecard.msprt(
      (batch1 ++ batch2).map(e => (e.group, e.value)).toDF("grp", "v"),
      Seq("grp"), "v", 100.0, 5000.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4),
        r.getDouble(5))).toMap
    fin.foreach { case (g, (n, lam, p)) =>
      val (bn, blam, bp) = bFin(g)
      assert(n == bn)
      assert(math.abs(lam - blam) < 5e-7, s"$g: $lam vs $blam")
      assert(math.abs(p - bp) < 5e-7)
    }
  }
}

class PqSpec extends SparkSpec {
  import spark.implicits._
  import graft.sim.Pq

  // three well-separated clusters in 8-d, deterministic
  private def corpus(n: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(19)
    Seq.tabulate(n) { i =>
      val c = i % 3
      val base = Array.fill(8)(c * 10.0f)
      (i.toLong, base.map(_ + rng.nextInt(100) / 100.0f).toSeq)
    }
  }

  test("codes are in [0,k) and encode is deterministic") {
    val df = corpus(90).toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", dim = 8, m = 2, k = 4, iters = 2)
    assert(model.codebooks.length == 2 &&
      model.codebooks.forall(_.length == 4))
    val a = Pq.encode(df, "id", "vec", model).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val b = Pq.encode(df, "id", "vec", model).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(a == b)
    assert(a.values.forall { case (c0, c1) =>
      c0 >= 0 && c0 < 4 && c1 >= 0 && c1 < 4 })
  }

  test("topK equals the driver-side ADC replay exactly, tie order " +
      "included") {
    val rows = corpus(60)
    val df = rows.toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", 8, m = 2, k = 4, iters = 2)
    val queries = rows.take(3).toDF("id", "vec")
    val got = Pq.topK(df, "id", "vec", queries, "id", "vec", 5, model)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1))
      .toMap

    // replay: encode via the model, ADC in plain scala
    val codes = Pq.encode(df, "id", "vec", model).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2))).toMap
    def adc(q: Seq[Float], cs: Seq[Int]): Double =
      (0 until 2).map { j =>
        val qx = Array.tabulate(4)(i =>
          math.floor(q(j * 4 + i).toDouble * 1048576.0))
        val cw = model.codebooks(j)(cs(j))
        (0 until 4).map { i => val d = qx(i) - cw(i); d * d }
          .reduceLeft(_ + _)
      }.reduceLeft(_ + _)
    rows.take(3).foreach { case (qid, qvec) =>
      val want = rows.map { case (id, _) => (adc(qvec, codes(id)), id) }
        .sorted.take(5).map(_._2)
      want.zipWithIndex.foreach { case (id, i) =>
        assert(got((qid, i + 1L)) == id, s"query $qid rank ${i + 1}")
      }
    }
  }

  test("cluster recall: querying a corpus point returns same-cluster " +
      "points at every rank") {
    val rows = corpus(90)
    val df = rows.toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", 8, m = 2, k = 8, iters = 3)
    val queries = rows.take(6).toDF("id", "vec")
    val got = Pq.topK(df, "id", "vec", queries, "id", "vec", 5, model)
      .collect()
    assert(got.length == 30)
    got.foreach { r =>
      assert(r.getLong(0) % 3 == r.getLong(1) % 3,
        s"query ${r.getLong(0)} pulled cross-cluster ${r.getLong(1)}")
    }
  }
}

class IvfPqSpec extends SparkSpec {
  import spark.implicits._
  import graft.sim.{IvfIndex, Pq}

  private def corpus(n: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(31)
    Seq.tabulate(n) { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 10.0f else 0.0f)
      (i.toLong, base.map(_ + rng.nextInt(100) / 100.0f).toSeq)
    }
  }

  test("full probe == plain PQ topK row for row (pruning is the ONLY " +
      "approximation IVFADC adds)") {
    val rows = corpus(90)
    val df = rows.toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", 8, m = 2, k = 4, iters = 2)
    val ivf = IvfIndex.fit(df, "id", "vec", nCentroids = 4)
    try {
      val queries = rows.take(4)
        .map { case (i, v) => (i, v) }.toDF("qid", "qvec")
      val full = Pq.ivfAdcTopK(ivf, model, queries, "qid", "qvec",
        kNn = 5, nProbe = ivf.nCentroids)
        .collect().map(r => (r.getLong(0), r.getLong(3)) ->
          (r.getLong(1), r.getDouble(2))).toMap
      val plain = Pq.topK(df, "id", "vec", queries, "qid", "qvec", 5, model)
        .collect().map(r => (r.getLong(0), r.getLong(3)) ->
          (r.getLong(1), r.getDouble(2))).toMap
      assert(full == plain)
    } finally ivf.release()
  }

  test("nProbe=1 on separated clusters still returns same-cluster " +
      "neighbors") {
    val rows = corpus(90)
    val df = rows.toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", 8, m = 2, k = 8, iters = 3)
    val ivf = IvfIndex.fit(df, "id", "vec", nCentroids = 3)
    try {
      val queries = rows.take(6).toDF("qid", "qvec")
      val got = Pq.ivfAdcTopK(ivf, model, queries, "qid", "qvec", 3, 1)
        .collect()
      assert(got.nonEmpty)
      got.foreach { r =>
        assert(r.getLong(0) % 3 == r.getLong(1) % 3,
          s"query ${r.getLong(0)} pulled cross-cluster ${r.getLong(1)}")
      }
    } finally ivf.release()
  }
}

class DensityClustersSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Geo

  test("textbook shape: two dense blobs, a bridge border point, and an " +
      "isolated noise point") {
    // blob A: ids 1-4 at (0,0..3); blob B: ids 10-13 at (0,200..203);
    // border: id 20 at (0,9) — within r of core 4 only, degree 1;
    // noise: id 30 at (0,500)
    val pts = (Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)) ++
      Seq((10L, 200L), (11L, 201L), (12L, 202L), (13L, 203L)) ++
      Seq((20L, 9L), (30L, 500L)))
      .map { case (id, lon) => (id, 0L, lon) }
      .toDF("id", "lat", "lon")
    val m = Geo.densityClusters(pts, "id", "lat", "lon",
        radiusCdeg = 6, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    Seq(1L, 2L, 3L, 4L).foreach(i => assert(m(i) == (("core", 1L)), i))
    Seq(10L, 11L, 12L, 13L).foreach(i => assert(m(i) == (("core", 10L)), i))
    assert(m(20L) == (("border", 1L)))
    assert(m(30L) == (("noise", -1L)))
  }

  test("raising minPts demotes cores to border/noise, never the reverse") {
    val rng = new scala.util.Random(5)
    val pts = Seq.tabulate(200)(i =>
      (i.toLong, (rng.nextInt(400)).toLong, (rng.nextInt(400)).toLong))
      .toDF("id", "lat", "lon")
    def roles(minPts: Int) =
      Geo.densityClusters(pts, "id", "lat", "lon", 50, minPts)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val loose = roles(3)
    val strict = roles(6)
    val demote = Map("core" -> 2, "border" -> 1, "noise" -> 0)
    strict.foreach { case (id, r) =>
      assert(demote(r) <= demote(loose(id)), s"$id: ${loose(id)} -> $r")
    }
  }
}
