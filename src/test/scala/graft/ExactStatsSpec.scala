package graft

import graft.operators.{ExactStats, Imputer}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Histogram-narrowing exact median vs a local sort: identical values
  * (pandas interpolation), including forced multi-round narrowing. */
class ExactStatsSpec extends SparkSpec {
  import spark.implicits._

  private def localMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    (s((s.length - 1) / 2) + s(s.length / 2)) / 2
  }

  test("matches local median: odd, even, duplicates, negatives") {
    val cases = Seq(
      Seq(3.0, 1.0, 2.0),
      Seq(4.0, 1.0, 3.0, 2.0),
      Seq(5.0, 5.0, 5.0, 5.0),
      Seq(-10.0, 0.5, 0.5, 99.0, -3.25),
      Seq(1.0))
    cases.foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("row_id", "x")
      val got = ExactStats.medians(df, Seq("x")).head.get
      assert(got == localMedian(xs), s"for $xs")
    }
  }

  test("nulls excluded; all-null column → None; two columns batched") {
    val df = Seq((1L, Some(1.0), Option.empty[Double]),
      (2L, Some(3.0), None), (3L, None, None))
      .toDF("row_id", "a", "b")
    val got = ExactStats.medians(df, Seq("a", "b"))
    assert(got == Seq(Some(2.0), None))
  }

  test("forced multi-round narrowing (tiny buckets + threshold)") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1e6 - 5e5)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("row_id", "x")
    val got = ExactStats.medians(df, Seq("x"), buckets = 4,
      collectThreshold = 10).head.get
    assert(got == localMedian(xs))
  }

  test("property: equals local median on random data") {
    val p = Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1e9, 1e9))) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("row_id", "x")
      ExactStats.medians(df, Seq("x"), buckets = 8,
        collectThreshold = 5).head.get == localMedian(xs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("infinities participate in the ordering without breaking narrowing") {
    val cases = Seq(
      Seq(1.0, Double.PositiveInfinity, 2.0, 3.0, Double.PositiveInfinity),
      Seq(Double.PositiveInfinity, Double.PositiveInfinity, 1.0),
      Seq(Double.NegativeInfinity, 5.0, 7.0),
      Seq(Double.NegativeInfinity, Double.PositiveInfinity))
    cases.foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("row_id", "x")
      val got = ExactStats.medians(df, Seq("x"), buckets = 4,
        collectThreshold = 1).head.get
      val exp = localMedian(xs)
      assert(got == exp || (got.isNaN && exp.isNaN), s"for $xs: $got vs $exp")
    }
  }

  test("no overflow near Double.MaxValue") {
    val df = Seq((1L, 1.0e308), (2L, 1.6e308)).toDF("row_id", "x")
    assert(ExactStats.medians(df, Seq("x")).head.get == 1.3e308)
  }

  test("Imputer distributedMedian fills the same value as percentile") {
    val df = Seq((1L, Some(1.0)), (2L, Some(3.0)), (3L, Some(5.0)), (4L, None))
      .toDF("row_id", "x")
    val dist = new Imputer(Seq("x"), Seq("x"), Some("median"),
      distributedMedian = true).transform(df)
    assertCol(dist, "x", Seq(1.0, 3.0, 5.0, 3.0))
  }

  test("orderStatsBatch: many ranks in one session == per-rank " +
      "orderStats, across distinct narrowing depths and duplicate ranks") {
    val df = (1 to 300).map(i => (i.toLong, (i * 37 % 101).toDouble,
      (i % 7).toDouble)).toDF("row_id", "x", "y")
    val ranks = Seq(0L, 59L, 150L, 299L, 59L) // includes a duplicate
    val batched = ExactStats.orderStatsBatch(df, Seq("x", "y"),
      _ => ranks, buckets = 16, collectThreshold = 8)
    val single = ranks.map(r => ExactStats.orderStats(df, Seq("x", "y"),
      _ => r, buckets = 16, collectThreshold = 8))
    for (c <- 0 to 1; ri <- ranks.indices)
      assert(batched(c)(ri) == single(ri)(c),
        s"col $c rank ${ranks(ri)}: ${batched(c)(ri)} vs ${single(ri)(c)}")
    // empty relation: every requested rank resolves to None
    val empty = df.filter(df("x") < 0)
    assert(ExactStats.orderStatsBatch(empty, Seq("x"), _ => Seq(0L, 5L))
      == Seq(Seq(None, None)))
  }
}
