package graft

import org.apache.spark.sql.functions._

import graft.relational.Relational

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("densifies each key's span; forward-fills gaps; floor-buckets") {
    // key 1: buckets 0,10,30 occupied -> grid 0..30, 20 ffilled from 10
    // key 2: single bucket
    val df = Seq(
      (1L, 3L, 2.0), (1L, 7L, 4.0),     // bucket 0, avg 3.0
      (1L, 12L, 6.0),                    // bucket 10
      (1L, 35L, 8.0),                    // bucket 30
      (2L, 41L, 1.0)                     // bucket 40
    ).toDF("k", "t", "v")
    val got = Relational.resample(df, Seq("k"), "t", 10L,
        Seq(avg("v").as("v_avg")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map(
      (1L, 0L) -> 3.0, (1L, 10L) -> 6.0, (1L, 20L) -> 6.0,
      (1L, 30L) -> 8.0, (2L, 40L) -> 1.0))
  }

  test("negative times floor-bucket (no toward-zero truncation)") {
    val df = Seq((1L, -5L, 1.0), (1L, 4L, 3.0)).toDF("k", "t", "v")
    val got = Relational.resample(df, Seq("k"), "t", 10L,
        Seq(max("v").as("m")))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got == Map(-10L -> 1.0, 0L -> 3.0))
  }

  test("multiple agg columns all forward-fill independently") {
    val df = Seq((1L, 0L, 1.0), (1L, 25L, 5.0)).toDF("k", "t", "v")
    val got = Relational.resample(df, Seq("k"), "t", 10L,
        Seq(sum("v").as("s"), count(lit(1)).as("c")))
      .collect().map(r => r.getLong(1) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == Map(0L -> ((1.0, 1L)), 10L -> ((1.0, 1L)),
      20L -> ((5.0, 1L))))
  }
}

class RobustOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flags the planted outlier; inliers keep small |z|") {
    val base = (1 to 99).map(i => 10.0 + (i % 5))
    val df = (base :+ 1000.0).toDF("v")
    val got = Relational.robustOutliers(df, "v", "z")
    val flagged = got.filter(col("z_flag")).select("v")
      .collect().map(_.getDouble(0)).toSeq
    assert(flagged == Seq(1000.0))
    // median 12, MAD = 1 -> z(10) = 0.6745*(-2)/1
    val z10 = got.filter(col("v") === 10.0).select("z")
      .head().getDouble(0)
    assert(math.abs(z10 - 0.6745 * -2.0) < 1e-12)
  }

  test("MAD = 0 -> null z, false flag") {
    val df = (Seq.fill(9)(5.0) :+ 99.0).toDF("v")
    val got = Relational.robustOutliers(df, "v", "z")
    assert(got.filter(col("z").isNotNull).count() == 0)
    assert(got.filter(col("z_flag")).count() == 0)
  }
}

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  test("counts per-key consecutive pairs; p normalizes per from-state") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b")
    ).toDF("k", "t", "typ")
    val got = Relational.transitions(df, Seq("k"), "t", "typ")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // from a: a->b twice, a->c once; from b: b->a once
    assert(got == Map(
      ("a", "b") -> ((2L, 2.0 / 3.0)),
      ("a", "c") -> ((1L, 1.0 / 3.0)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("last event of each key emits no transition; ties break on tieCols") {
    val df = Seq(
      (1L, 1L, 1L, "x"), (1L, 1L, 2L, "y"), (1L, 2L, 1L, "z")
    ).toDF("k", "t", "id", "typ")
    val got = Relational.transitions(df, Seq("k"), "t", "typ", Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("x", "y"), ("y", "z")))
  }
}
