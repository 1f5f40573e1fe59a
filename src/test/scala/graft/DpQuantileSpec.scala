package graft

import graft.relational.Privacy
import org.apache.spark.sql.functions._

/** DP quantile release: the discrete report-noisy-max mechanism with the
  * integer threshold-cascade geometric draw. Pins the threshold table's
  * analytic properties, the mechanism's determinism (same tag → same
  * release), accuracy under a fixed draw (noise is rank-bounded by
  * maxNoise), and the sensitivity of the release to the tag (different
  * tag → different noise, usually a different cliff-side pick on a
  * crafted knife-edge corpus). */
class DpQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("geometric thresholds: strictly increasing, mass 1 - O(p^K), " +
      "outcome order 0, +1, -1, ...") {
    val ts = Privacy.geometricThresholds(0.5, 24)
    assert(ts.map(_._2) ==
      (0 +: (1 to 24).flatMap(k => Seq(k, -k))))
    assert(ts.map(_._1) == ts.map(_._1).sorted)
    assert(ts.map(_._1).distinct.size == ts.size, "strictly increasing")
    val full = math.pow(2.0, 60)
    // truncated mass: 1 - p^K; at p=.5, K=24 the deficit is ~6e-8
    assert(ts.last._1 <= full.toLong)
    assert(ts.last._1 >= ((1.0 - 6.0e-8) * full).toLong)
    // P(0) = (1-p)/(1+p) = 1/3 of the grid
    assert(math.abs(ts.head._1 / full - 1.0 / 3.0) < 1e-12)
  }

  test("release is deterministic and rank-noise-bounded: each released " +
      "edge's true rank is within maxNoise of the target") {
    // values 0..9999 uniformly: true rank of edge e over [0,10000) with
    // 100 bins is e; utility peaks at the target rank, geometric noise
    // shifts the pick by at most maxNoise ranks per candidate, and
    // adjacent edges differ by 100 ranks here — the pick lands on one
    // of the two edges around the target
    val df = spark.range(10000).select(col("id").cast("double").as("v"))
    val qs = Seq(0.25, 0.5, 0.9)
    val r1 = Privacy.dpQuantiles(df, "v", qs, 0.0, 10000.0, 100, "t1")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val r2 = Privacy.dpQuantiles(df, "v", qs, 0.0, 10000.0, 100, "t1")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(r1 == r2, "same tag must replay the identical release")
    qs.foreach { q =>
      val target = q * 10000
      // edge step is 100 values; |true rank - target| <= step/2 + 2*noise
      assert(math.abs(r1(q) - target) <= 100 + 2 * 24,
        s"q=$q released ${r1(q)} vs target $target")
    }
  }

  test("a fresh tag is a fresh draw: on a knife-edge corpus some " +
      "released value moves with the tag") {
    // ~20 candidate edges tie in utility (all mass sits at 400 and 600,
    // every edge in (400, 600] sees exactly half the ranks) — the
    // geometric draw alone decides among them, so across several tags
    // the release must not be constant
    val df = spark.range(1000)
      .select((lit(400.0) + (col("id") % 2) * 200.0).as("v"))
    val picks = ('a' to 'j').map { tag =>
      Privacy.dpQuantiles(df, "v", Seq(0.5), 0.0, 1000.0, 100,
        tag.toString).head().getDouble(1)
    }
    assert(picks.distinct.size >= 2,
      s"ten tags produced identical knife-edge releases: $picks")
    // and every pick stays on the tied plateau
    picks.foreach(v => assert(v >= 410 && v <= 600, s"pick $v"))
  }

  test("grouped release: per-group draws are independent (same data in " +
      "two groups can release differently), deterministic, and " +
      "rank-noise-bounded per group") {
    // identical value distribution in each group — any release
    // difference between groups is purely the group-keyed noise
    val df = spark.range(4000).select(
      (col("id") % 4).cast("string").as("g"),
      (col("id") / 4).cast("double").as("v"))
    val r1 = Privacy.dpQuantilesBy(df, Seq("g"), "v", Seq(0.5),
      0.0, 1000.0, 100, "gt").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val r2 = Privacy.dpQuantilesBy(df, Seq("g"), "v", Seq(0.5),
      0.0, 1000.0, 100, "gt").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r1 == r2, "same tag must replay identically")
    assert(r1.keySet == Set("0", "1", "2", "3"))
    // every group's release is near the shared true median (500);
    // adjacent edges are 10 values (40 ranks) apart, noise <= 24 ranks
    r1.values.foreach(v => assert(math.abs(v - 500) <= 20,
      s"grouped release $v"))
  }

  test("released values never leave the candidate grid or reveal raw " +
      "values") {
    val df = Seq(123.456, 789.012, 555.5, 999.9).toDF("v")
    val out = Privacy.dpQuantiles(df, "v", Seq(0.5), 0.0, 1000.0, 10, "t")
      .head().getDouble(1)
    // candidates are multiples of 100 in (0, 1000]
    assert(out % 100.0 == 0.0 && out >= 100.0 && out <= 1000.0)
  }
}
