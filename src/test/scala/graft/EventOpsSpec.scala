package graft

import org.apache.spark.sql.functions._

import graft.relational.Relational

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, t, type)
  private val log = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),   // full
    (2L, 10L, "view"), (2L, 5L, "click"),                      // click BEFORE view
    (3L, 10L, "view"),                                         // view only
    (4L, 10L, "click"), (4L, 20L, "buy"),                      // never viewed
    (5L, 10L, "view"), (5L, 10L, "click")                      // not strictly after
  ).toDF("u", "t", "typ")

  test("greedy-earliest ordered funnel; strict ordering; partials kept") {
    val got = Relational.funnel(log, "u", "t", "typ",
        Seq("view", "click", "buy"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == ((Some(10L), None, None)), "click before view")
    assert(got(3L) == ((Some(10L), None, None)))
    assert(!got.contains(4L), "funnel starts at step 1")
    assert(got(5L) == ((Some(10L), None, None)), "same instant != after")
  }

  test("earliest qualifying step event wins, not earliest overall") {
    val df = Seq((1L, 10L, "view"), (1L, 5L, "click"), (1L, 25L, "click"),
      (1L, 15L, "click")).toDF("u", "t", "typ")
    val r = Relational.funnel(df, "u", "t", "typ", Seq("view", "click"))
      .head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 15L)
  }
}

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("cohort by first day; one count per (user, offset); offset 0 = size") {
    val df = Seq(
      (1L, 100L), (1L, 100L), (1L, 101L), (1L, 105L),
      (2L, 100L), (2L, 105L),
      (3L, 101L)
    ).toDF("u", "day")
    val got = Relational.retention(df, "u", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (100L, 0L) -> 2L, // users 1, 2
      (100L, 1L) -> 1L, // user 1 (duplicate same-day events collapse)
      (100L, 5L) -> 2L, // users 1, 2
      (101L, 0L) -> 1L  // user 3
    ))
  }
}

class DedupeConsecutiveSpec extends SparkSpec {
  import spark.implicits._

  test("keeps run-starting rows per key; null-safe value compare") {
    val df = Seq(
      (1L, 1L, Some("a")), (1L, 2L, Some("a")), (1L, 3L, Some("b")),
      (1L, 4L, None), (1L, 5L, None), (1L, 6L, Some("a")),
      (2L, 1L, Some("x"))
    ).toDF("k", "t", "v")
    val kept = Relational.dedupeConsecutive(df, Seq("k"), "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((1L, 1L), (1L, 3L), (1L, 4L), (1L, 6L), (2L, 1L)))
  }
}

class PercentileRankSpec extends SparkSpec {
  import spark.implicits._

  test("matches percent_rank over non-null rows; nulls stay null") {
    val df = Seq[java.lang.Double](10.0, 20.0, 20.0, 30.0, null)
      .toDF("v")
    val got = Relational.percentileRank(df, "v", "pr")
      .collect().map(r => Option(r.get(0)).map(_.toString) ->
        Option(r.get(1))).toMap
    // N = 4: pr(10)=0, pr(20)=1/3, pr(30)=3/3
    assert(got(Some("10.0")) == Some(0.0))
    assert(got(Some("20.0")) == Some(1.0 / 3.0))
    assert(got(Some("30.0")) == Some(1.0))
    assert(got(None).isEmpty)
  }

  test("agrees with Spark's own percent_rank on a dense column") {
    val df = (1 to 200).map(i => (i % 13).toDouble).toDF("v")
    val viaOp = Relational.percentileRank(df, "v", "pr")
      .select("v", "pr").distinct().collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val viaWindow = df.withColumn("pr", percent_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("v")))
      .select("v", "pr").distinct().collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(viaOp == viaWindow)
  }

  test("binned path on a unique-valued (continuous) column matches the " +
      "window path — no single-task window over an N-sized distinct set") {
    // every value unique + a shuffled, non-monotone layout: distinct = N,
    // the degenerate case for the broadcast/window path
    val df = (1 to 500).map(i => ((i * 131) % 1000).toDouble + i / 1000.0)
      .toDF("v")
    val small = Relational.percentileRank(df, "v", "pr")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val binned = Relational.percentileRank(df, "v", "pr",
        maxDistinctBroadcast = 10)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(binned == small)
  }

  test("binned path grouped: per-group ECDF matches the window path") {
    val df = (1 to 400).map(i =>
      (if (i % 2 == 0) "a" else "b", ((i * 37) % 500).toDouble + i))
      .toDF("g", "v")
    val small = Relational.percentileRank(df, "v", "pr", Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val binned = Relational.percentileRank(df, "v", "pr", Seq("g"),
        maxDistinctBroadcast = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(binned == small)
  }
}
