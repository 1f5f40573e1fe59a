package graft

import org.apache.spark.sql.functions._

/** Round-7 operator suites: token entropy, JS divergence, Theil–Sen. */
class TokenEntropySpec extends SparkSpec {
  import spark.implicits._
  import graft.text.Ranking

  test("hand cases: uniform, degenerate, and mixed distributions") {
    val df = Seq(
      (1L, "a a b b"),    // uniform over 2 types -> ln 2
      (2L, "a a a a"),    // single type -> 0
      (3L, "a b c d"),    // uniform over 4 types -> ln 4
      (4L, "a a b c"),    // mixed: ln4 - (2 ln2)/4
      (5L, ""))           // no tokens -> absent
      .toDF("doc_id", "text")
    val m = Ranking.tokenEntropy(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m.keySet == Set(1L, 2L, 3L, 4L))
    assert(m(1L)._1 == 4L && m(1L)._2 == 2L)
    assert(math.abs(m(1L)._3 - math.log(2)) < 1e-12)
    assert(m(2L)._3 == 0.0)
    assert(math.abs(m(3L)._3 - math.log(4)) < 1e-12)
    // direct -sum p ln p for (1/2, 1/4, 1/4)
    val direct = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert(math.abs(m(4L)._3 - direct) < 1e-12)
  }

  test("plan is two aggregates: no window, no join") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val p = graft.text.Ranking.tokenEntropy(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }
}

class JsDivergenceSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.Ranking

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("identical corpora diverge by exactly zero; totals and vocab " +
      "size are the integers") {
    val a = docs("x y z", "x x")
    val r = Ranking.jsDivergence(a, a, "text").collect()(0)
    assert(r.getLong(0) == 3L)   // n_terms
    assert(r.getLong(1) == 5L && r.getLong(2) == 5L)
    assert(r.getDouble(3) == 0.0) // pa == pb term-for-term -> ln(1) = 0
  }

  test("symmetric, positive on drift, bounded by ln 2") {
    val a = docs("aa aa bb")
    val b = docs("cc cc dd")
    val ab = Ranking.jsDivergence(a, b, "text").collect()(0).getDouble(3)
    val ba = Ranking.jsDivergence(b, a, "text").collect()(0).getDouble(3)
    assert(math.abs(ab - ba) < 1e-12) // sum order only
    assert(ab > 0.05 && ab < math.log(2)) // smoothing keeps it below ln 2
    val near = Ranking.jsDivergence(a, docs("aa aa bb", "aa"), "text")
      .collect()(0).getDouble(3)
    assert(near < ab) // mild drift < disjoint drift
  }
}

class IsotonicCalibrationSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Eval

  private def fit(rows: Seq[(Double, Long)], nBins: Int) =
    Eval.isotonicCalibration(rows.toDF("score", "label"), "score",
      "label", nBins).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toMap

  test("a violating pair pools to its weighted mean (the PAV move)") {
    // bin0 rate .5, bin1 rate 0 -> pooled (1+0)/(2+2) = .25 both
    val m = fit(Seq((0.1, 1L), (0.2, 0L), (0.6, 0L), (0.7, 0L)), 2)
    assert(m(0L) == ((2L, 1L, 0.5, 0.25)))
    assert(m(1L) == ((2L, 0L, 0.0, 0.25)))
  }

  test("an already-monotone curve is unchanged") {
    val m = fit(Seq((0.1, 0L), (0.2, 0L), (0.6, 1L), (0.7, 1L)), 2)
    assert(m(0L)._4 == 0.0 && m(1L)._4 == 1.0)
  }

  test("isotonicScore is a stream-static broadcast join: stream == " +
      "batch, unseen bins fall back to the default") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // fit observes bins {0, 2} of 4 (rates .5 and 0 -> pooled .25)
    val fit = Eval.isotonicCalibration(
      Seq((0.1, 1L), (0.2, 0L), (0.6, 0L), (0.7, 0L))
        .toDF("score", "label"),
      "score", "label", 4).localCheckpoint(true)
    val scores = Seq((1L, 0.1), (2L, 0.3), (3L, 0.7)) // bin1 unseen

    val mem = MemoryStream[(Long, Double)]
    val q = Eval.isotonicScore(mem.toDS().toDF("id", "score"), "score",
        fit, 4, defaultRate = -1.0)
      .select("id", "calibrated")
      .writeStream.outputMode("append").format("memory")
      .queryName("iso_s").start()
    try {
      mem.addData(scores(0), scores(1))
      q.processAllAvailable()
      mem.addData(scores(2))
      q.processAllAvailable()
    } finally q.stop()

    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toList
    val streamed = key(spark.table("iso_s").collect())
    val batch = key(Eval.isotonicScore(scores.toDF("id", "score"),
      "score", fit, 4, defaultRate = -1.0)
      .select("id", "calibrated").collect())
    assert(streamed == batch)
    assert(streamed == List((1L, 0.25), (2L, -1.0), (3L, 0.25)))
  }

  test("iso_rate is non-decreasing and preserves total positive mass " +
      "on a noisy curve") {
    // deterministic noisy labels: positive when (k * 7) % 10 < k % 7
    val rows = (0 until 200).map { k =>
      (k / 200.0, if ((k * 7) % 10 < k % 7) 1L else 0L)
    }
    val got = Eval.isotonicCalibration(rows.toDF("score", "label"),
      "score", "label", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
      .sortBy(_._1)
    assert(got.sliding(2).forall {
      case Array(a, b) => a._4 <= b._4
      case _ => true
    })
    val mass = got.map(t => t._2 * t._4).sum
    val pos = got.map(_._3).sum.toDouble
    assert(math.abs(mass - pos) < 1e-3) // 6-dp rounding only
  }
}

class AbcClassesSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Analytics

  test("textbook 80/95 tiers on a hand distribution; boundary rows " +
      "are INCLUSIVE via integer cross-multiplication") {
    // values 50/30/15/5: cum shares 50, 80, 95, 100 -> A A B C with
    // both boundaries landing exactly on their tier edge
    val df = Seq(("e1", 50L), ("e2", 30L), ("e3", 15L), ("e4", 5L))
      .flatMap { case (e, v) => Seq.fill(5)((e, v / 5)) } // pre-agg input
      .toDF("ent", "v")
    val got = Analytics.abcClasses(df, Seq.empty, "ent", "v")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
      .toMap
    assert(got("e1") == ((50L, 1L, 50L, "A")))
    assert(got("e2") == ((30L, 2L, 80L, "A")))
    assert(got("e3") == ((15L, 3L, 95L, "B")))
    assert(got("e4") == ((5L, 4L, 100L, "C")))
  }

  test("groups classify independently; ties order by entity") {
    val df = Seq(
      ("g1", "a", 8L), ("g1", "b", 1L), ("g1", "c", 1L),
      ("g2", "a", 1L), ("g2", "b", 1L)) // tie -> a ranks first
      .toDF("g", "ent", "v")
    val got = Analytics.abcClasses(df, Seq("g"), "ent", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getString(5)))
      .toMap
    assert(got(("g1", "a")) == ((1L, "A")))   // 80% exactly
    assert(got(("g2", "a"))._1 == 1L)
    assert(got(("g2", "b")) == ((2L, "C")))   // 100% > 95%
  }
}

class HllStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Sketches
  import graft.streaming.Streaming

  test("scala bucketRho == the SQL md5 expressions, key for key") {
    val keys = (1 to 200).map(i => s"key-$i-${i * 31}")
    // single-key groups: batch registers expose each key's (bucket, rho)
    val sql = Sketches.hllSketch(
      keys.toDF("k").withColumn("g", col("k")), Seq("g"), "k")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    keys.foreach { k =>
      assert(Sketches.bucketRho(k) == sql(k), s"key $k")
    }
  }

  test("streamed registers across micro-batches == batch hllSketch " +
      "register for register (and hence identical estimates)") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batch1 = (1 to 300).map(i => Streaming.HllEvent(s"g${i % 2}", s"u$i"))
    val batch2 = (200 to 500).map(i =>
      Streaming.HllEvent(s"g${i % 2}", s"u$i")) // overlap: max must absorb

    val mem = MemoryStream[Streaming.HllEvent]
    val q = Streaming.hllStream(mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("hll_s").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // update-mode sink appends per-batch snapshots; rho is monotone, so
    // max per (group, bucket) is the final state
    val streamed = spark.table("hll_s")
      .groupBy("group", "bucket").agg(max("rho").as("rho"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val batch = Sketches.hllSketch(
      (batch1 ++ batch2).toDF("group", "key"), Seq("group"), "key")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(streamed == batch)
  }
}

class ConcentrationSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Analytics

  private def fit(rows: Seq[(String, String, Long)]) =
    Analytics.concentration(rows.toDF("g", "ent", "v"), Seq("g"),
      "ent", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

  test("monopoly -> HHI 1 / effective_n 1 / entropy 0; even split of " +
      "n -> HHI 1/n / effective_n n / entropy ln n") {
    val m = fit(Seq(
      ("mono", "a", 7L),
      ("even", "a", 5L), ("even", "b", 5L), ("even", "c", 5L),
      ("even", "d", 5L)))
    assert(m("mono") == ((1L, 7L, 1.0, 1.0, 0.0)))
    val (n, total, hhi, eff, h) = m("even")
    assert(n == 4L && total == 20L)
    assert(math.abs(hhi - 0.25) < 1e-12)
    assert(math.abs(eff - 4.0) < 1e-12)
    assert(math.abs(h - math.log(4)) < 1e-12)
  }

  test("skew raises HHI and lowers effective_n/entropy; non-positive " +
      "rows drop") {
    val even = fit(Seq(("g", "a", 5L), ("g", "b", 5L)))("g")
    val skew = fit(Seq(("g", "a", 9L), ("g", "b", 1L),
      ("g", "z", 0L), ("g", "y", -3L)))("g")
    assert(skew._1 == 2L) // zero/negative entities dropped
    assert(skew._3 > even._3 && skew._4 < even._4 && skew._5 < even._5)
    // hand value: shares (.9, .1) -> HHI .82
    assert(math.abs(skew._3 - 0.82) < 1e-12)
  }
}

class QSketchStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Sketches
  import graft.streaming.Streaming

  test("streamed quantile registers across micro-batches == batch " +
      "qSketch count for count (edge clamps included)") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // values straddle the range on both sides to exercise the clamps
    val batch1 = (-20 to 400).map(i =>
      Streaming.QEvent(s"g${i % 3}", i / 7.0))
    val batch2 = (300 to 700).map(i =>
      Streaming.QEvent(s"g${i % 3}", i / 7.0))

    val mem = MemoryStream[Streaming.QEvent]
    val q = Streaming.qSketchStream(mem.toDS(), lo = 0.0, hi = 50.0,
        bins = 64)
      .writeStream.outputMode("update").format("memory")
      .queryName("qs_s").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // cnt is monotone per (group, bin): max across emissions = final
    val streamed = spark.table("qs_s")
      .groupBy("group", "bin").agg(max("cnt").as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.qSketch(
      (batch1 ++ batch2).toDF("group", "value"), Seq("group"), "value",
      lo = 0.0, hi = 50.0, bins = 64)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }
}

class LangIdStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.LangId

  test("literal classify is a pure projection: runs unchanged on a " +
      "stream and matches batch row-for-row across micro-batches") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val labeled = Seq(
      (1L, "the cat sat on the mat and the dog sat on the rug", "x"),
      (2L, "le chat est sur le tapis et le chien est la aussi", "y"))
      .toDF("doc_id", "text", "lang")
    val prof = LangId.fitProfiles(labeled, "text", "lang", n = 3,
      topK = 32).localCheckpoint(true)
    val docs = Seq((10L, "the cat and the dog"),
      (11L, "le chat et le chien"), (12L, "zzz qqq www"))

    val mem = MemoryStream[(Long, String)]
    val q = LangId.classify(mem.toDS().toDF("doc_id", "text"),
        "doc_id", "text", prof, n = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("langid_s").start()
    try {
      mem.addData(docs(0), docs(1))
      q.processAllAvailable()
      mem.addData(docs(2)) // zero-overlap doc -> ('und', 0)
      q.processAllAvailable()
    } finally q.stop()

    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toList
    val streamed = key(spark.table("langid_s").collect())
    val batch = key(LangId.classify(docs.toDF("doc_id", "text"),
      "doc_id", "text", prof, n = 3).collect())
    assert(streamed == batch && streamed.map(_._1) ==
      List(10L, 11L, 12L))
  }
}

class TheilSenSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Analytics

  private def fit(rows: Seq[(String, Long, Double, Double)],
      maxN: Int = 64) =
    Analytics.theilSen(
      rows.toDF("g", "id", "x", "y"), "g", "x", "y", "id", maxN)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toMap

  test("exact slope AND intercept on a perfect line; median defeats " +
      "one wild outlier") {
    val line = (0 to 4).map(i => ("a", i.toLong, i.toDouble, 2.0 * i + 1))
    val outl = (0 to 3).map(i => ("b", i.toLong, i.toDouble, i.toDouble)) :+
      ("b", 4L, 4.0, 100.0)
    val m = fit(line ++ outl)
    assert(m("a") == ((5L, 10L, 2.0, 1.0))) // y = 2x + 1 recovered exactly
    // slopes: 1.0 x6, then 25, 33, 48.5..., 97 -> lower median (rank 5) = 1.0
    // residuals at slope 1: (0,0,0,0,96) -> lower median (rank 3) = 0.0
    assert(m("b")._3 == 1.0 && m("b")._2 == 10L && m("b")._4 == 0.0)
  }

  test("equal-x pairs are skipped; an all-equal-x group is absent") {
    val m = fit(Seq(
      ("a", 1L, 0.0, 0.0), ("a", 2L, 0.0, 9.0), ("a", 3L, 1.0, 2.0),
      ("z", 7L, 5.0, 1.0), ("z", 8L, 5.0, 2.0)))
    assert(!m.contains("z"))
    // pairs (1,3) slope 2, (2,3) slope -7; (1,2) skipped -> m=2, rank 1
    assert(m("a") == ((3L, 2L, -7.0, 9.0))) // residuals (0,9,9) -> rank 2
  }

  test("cap keeps the maxN smallest-x points, ties to the lower id") {
    val pts = Seq(
      ("a", 10L, 0.0, 0.0), ("a", 11L, 0.0, 4.0),
      ("a", 12L, 1.0, 1.0), ("a", 13L, 9.0, 0.0))
    // maxN=2: keep x=0 twice (ids 10,11) -> all pairs equal-x -> absent
    assert(!fit(pts, maxN = 2).contains("a"))
    // maxN=3: ids 10,11,12 -> slopes (10,12)=1, (11,12)=-3 -> rank 2 of
    // sorted (-3, 1) is... lower median rank (2+1)/2=1 -> -3.0
    val m3 = fit(pts, maxN = 3)
    assert(m3("a") == ((3L, 2L, -3.0, 4.0))) // residuals (0,4,4) -> rank 2
  }

  test("pair relation and rank window stay group-local: no cartesian") {
    val df = Seq(("a", 1L, 0.0, 0.0), ("a", 2L, 1.0, 1.0))
      .toDF("g", "id", "x", "y")
    val p = Analytics.theilSen(df, "g", "x", "y", "id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
  }
}
