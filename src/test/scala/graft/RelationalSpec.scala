package graft

import graft.relational.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  // a skewed fixture: one hot key with 500 rows, 50 cold keys
  private lazy val skewed = ((1 to 500).map(i => (1L, s"hot$i")) ++
    (1 to 50).map(i => (i.toLong + 1, s"cold$i"))).toDF("k", "payload")
  private lazy val dim = (1 to 51).map(i => (i.toLong, s"name$i"))
    .toDF("k", "name")

  test("saltedJoin result equals the plain join (inner and left)") {
    val plain = skewed.join(dim, Seq("k")).orderBy("payload")
      .collect().toSeq
    val salted = Relational.saltedJoin(skewed, dim, Seq("k"), 8)
      .orderBy("payload").collect().toSeq
    assert(salted == plain)

    val dimHoley = dim.filter(col("k") =!= 1) // hot key unmatched
    val plainL = skewed.join(dimHoley, Seq("k"), "left")
      .orderBy("payload").collect().toSeq
    val saltedL = Relational.saltedJoin(skewed, dimHoley, Seq("k"), 8, "left")
      .orderBy("payload").collect().toSeq
    assert(saltedL == plainL)
    assert(plainL.count(_.isNullAt(2)) == 500) // hot rows kept, null name
  }

  test("saltedJoin rejects right/full outer") {
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(skewed, dim, Seq("k"), 8, "full")
    }
  }

  test("topKPerGroup matches the window formulation, ties on lower id") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 1.0)).toDF("g", "id", "score")
    val got = Relational.topKPerGroup(df, Seq("g"), "score", "id", 2)
      .orderBy("g", "rank").collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // a: the two 30.0s, lower id first; b: its only row
    assert(got == Seq(("a", 2L, 30.0, 1), ("a", 3L, 30.0, 2),
      ("b", 5L, 1.0, 1)))
  }

  test("asofJoin: most recent right row at or before, per key; else null") {
    val lefts = Seq(
      ("A", 0L, 100L), ("A", 1L, 101L), ("A", 3L, 102L), ("A", 6L, 103L),
      ("B", 4L, 104L)).toDF("u", "t", "lid")
    val rights = Seq(
      ("A", 1L, 10.0), ("A", 5L, 50.0)).toDF("u", "t", "rv")
    val out = Relational.asofJoin(lefts, rights, "t", Seq("u"), Seq("rv"))
      .orderBy("lid").collect().toSeq
      .map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Double]("rv")).map(_.toDouble)))
    assert(out == Seq(
      (100L, None),       // before any right row
      (101L, Some(10.0)), // tie at equal ts matches (inclusive)
      (102L, Some(10.0)),
      (103L, Some(50.0)),
      (104L, None)))      // key with no right rows at all
  }

  test("asofJoin: a matched right row with null fields stays ONE row") {
    // regression: per-column last(ignoreNulls) windows would stitch the
    // ts=5 row's ts with the ts=1 row's value — a match that never existed
    val lefts = Seq(("A", 6L, 100L)).toDF("u", "t", "lid")
    val rights = Seq(
      ("A", 1L, Some(10.0), 1L), ("A", 5L, None, 5L))
      .toDF("u", "t", "rv", "rts")
    val out = Relational.asofJoin(lefts, rights, "t", Seq("u"),
      Seq("rv", "rts")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("rv"))) // ts=5 row's null
    assert(out.head.getAs[Long]("rts") == 5L)            // same real row
  }

  test("topKPerGroup rejects non-integral id columns") {
    val df = Seq(("a", "uuid-1", 1.0)).toDF("g", "id", "score")
    intercept[IllegalArgumentException] {
      Relational.topKPerGroup(df, Seq("g"), "score", "id", 2)
    }
  }

  test("asofJoin rejects colliding right column names") {
    val l = Seq(("A", 1L, 1.0)).toDF("u", "t", "v")
    val r = Seq(("A", 1L, 2.0)).toDF("u", "t", "v")
    intercept[IllegalArgumentException] {
      Relational.asofJoin(l, r, "t", Seq("u"), Seq("v"))
    }
  }

  test("heavyHitters equals GROUP BY HAVING exactly (long and string keys)") {
    // skew: key 1 × 500, key 2 × 40, 50 singletons, plus nulls
    val longKeys = ((1 to 500).map(_ => Some(1L)) ++
      (1 to 40).map(_ => Some(2L)) ++
      (1 to 50).map(i => Some(100L + i)) ++ Seq(None, None))
      .toDF("k")
    val expected = longKeys.filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 40).orderBy("k").collect().toSeq
    val got = Relational.heavyHitters(longKeys, "k", 40)
      .orderBy("k").collect().toSeq
    assert(got == expected)
    assert(got.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1L, 500L), (2L, 40L)))

    val strKeys = ((1 to 30).map(_ => "hot") ++ (1 to 29).map(_ => "warm") ++
      (1 to 28).map(i => s"cold$i")).toDF("s")
    val gotS = Relational.heavyHitters(strKeys, "s", 29)
      .orderBy("s").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(gotS == Seq(("hot", 30L), ("warm", 29L)))
  }

  test("heavyHitters rejects non-key types and bad thresholds") {
    val df = Seq(1.5, 2.5).toDF("d")
    intercept[IllegalArgumentException] {
      Relational.heavyHitters(df, "d", 1)
    }
    intercept[IllegalArgumentException] {
      Relational.heavyHitters(Seq(1L).toDF("k"), "k", 0)
    }
  }

  test("same-bucketing equi-join runs without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i.toLong % 97, i.toLong))
        .toDF("k", "v1")
      val facts2 = (1 to 1000).map(i => (i.toLong % 97, i.toLong * 2))
        .toDF("k", "v2")
      Relational.writeBucketed(facts, "bkt_a", Seq("k"), 4)
      Relational.writeBucketed(facts2, "bkt_b", Seq("k"), 4)
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        facts.join(facts2, "k").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}

class CheckConstraintsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Relational._

  test("each rule type counts exactly its violations") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "A", 5.0), (1L, "A", 7.0), (2L, "N", 60.0),
      (3L, "X", null), (null, "A", 3.0))
      .toDF("k", "flag", "qty")
    val ref = Seq(1L, 2L).toDF("rk")
    val got = checkConstraints(df, Seq(
      NotNull("k"), NotNull("qty"),
      InRange("qty", 1, 50),
      Accepted("flag", Seq("A", "N")),
      Unique(Seq("k")),
      ForeignKey("k", ref, "rk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null(k)" -> 1L,          // the null k
      "not_null(qty)" -> 1L,        // the null qty
      "in_range(qty,1.0,50.0)" -> 1L, // 60.0; null qty not counted
      "accepted(flag)" -> 1L,       // X
      "unique(k)" -> 1L,            // second row with k=1 (nulls group too)
      "foreign_key(k)" -> 1L))      // k=3; null k passes
  }

  test("row-level rules fuse into one aggregate over one scan") {
    val df = Seq((1L, 2.0)).toDF("k", "v")
    val plan = checkConstraints(df, Seq(
      NotNull("k"), InRange("v", 0, 1), Accepted("k", Seq("1"))))
      .queryExecution.executedPlan.toString
    // one fused agg -> no union branches, a single scan of the input
    assert(!plan.contains("Union"), plan.take(500))
  }

  test("all-clean input reports zeros, never nulls") {
    val df = Seq((1L, "A"), (2L, "N")).toDF("k", "flag")
    val got = checkConstraints(df, Seq(
      NotNull("k"), Unique(Seq("k")),
      ForeignKey("k", Seq(1L, 2L).toDF("rk"), "rk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L))
  }
}

class LayoutSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Layout

  test("morton interleave: bit b of dim i lands at position b*n+i") {
    val df = Seq((3.0, 1.0)).toDF("x", "y")
    val got = df.select(Layout.mortonKey(
      Seq((col("x"), 0.0, 4.0), (col("y"), 0.0, 4.0)), bits = 2))
      .head.getLong(0)
    // x=3 (11b), y=1 (01b) -> bits: x0@0, y0@1, x1@2, y1@3 -> 0111b
    assert(got == 7L)
  }

  test("out-of-range clamps to edge cells; null clamps low") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (-5.0, 99.0), (null, 2.0)).toDF("x", "y")
    val keys = df.select(Layout.mortonKey(
      Seq((col("x"), 0.0, 4.0), (col("y"), 0.0, 4.0)), bits = 2))
      .collect().map(_.getLong(0))
    // (-5 -> cell 0, 99 -> cell 3): y bits 11 at positions 1,3 -> 10
    // (null -> cell 0, 2 -> cell 2): y bits 10 at positions 1,3 -> 8
    assert(keys.toSeq == Seq(10L, 8L))
  }

  test("locality: nearby points share high key bits, far points do not") {
    val near = Seq((10.0, 10.0), (11.0, 11.0), (200.0, 200.0))
      .toDF("x", "y")
      .select(Layout.mortonKey(
        Seq((col("x"), 0.0, 256.0), (col("y"), 0.0, 256.0)), bits = 8))
      .collect().map(_.getLong(0))
    assert(math.abs(near(0) - near(1)) < math.abs(near(0) - near(2)))
  }

  test("clusterByKey plans a range exchange + partition-local sort") {
    val df = (1 to 100).map(i => (i.toLong, i * 7 % 100)).toDF("id", "k")
    val plan = Layout.clusterByKey(df, col("k"), 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(400))
    assert(plan.contains("Sort") && !plan.contains("global=true"),
      plan.take(400))
  }
}

class SkewStatsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Relational

  test("counts, hottest key, and max/mean ratio are exact") {
    // key a: 6 rows, b: 2, c: 2 -> n=10, keys=3, max=6, avg=10/3
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val r = Relational.skewStats(df, Seq("k")).head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L &&
      r.getLong(2) == 6L)
    assert(r.getDouble(3) == math.rint(10.0 / 3.0 * 1e6) / 1e6)
    assert(r.getDouble(4) == math.rint(6.0 / (10.0 / 3.0) * 1e6) / 1e6)
    assert(r.getString(5) == "a")
    // count ties break to the lexicographically largest key
    val tie = Relational.skewStats(Seq("x", "y").toDF("k"), Seq("k")).head
    assert(tie.getString(5) == "y")
  }

  test("one aggregation pass after the key shuffle (no extra job/sort)") {
    val df = Seq("a", "b").toDF("k")
    val plan = Relational.skewStats(df, Seq("k"))
      .queryExecution.executedPlan.toString
    // no SortExec node (SortAggregate over zero grouping keys is fine —
    // it never materializes a sort) and only the two necessary
    // exchanges: the key shuffle + the single-partition finish
    assert(!plan.contains("Sort ["), plan.take(400))
    assert(plan.sliding(9).count(_ == "Exchange ") == 2, plan.take(600))
  }
}

class WritePartitionedSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Layout

  test("hive layout on disk; reads prune partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part")
      .toString
    val df = Seq((1L, "click"), (2L, "view"), (3L, "click"), (4L, "buy"))
      .toDF("id", "etype")
    Layout.writePartitioned(df, dir, Seq("etype"))
    val dirs = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("etype=")).sorted
    assert(dirs.toSeq == Seq("etype=buy", "etype=click", "etype=view"))
    val back = spark.read.parquet(dir).filter(col("etype") === "click")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(etype"),
      scan.take(600))
    assert(back.count() == 2)
  }
}

class HistogramSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Relational

  test("exact bin counts; nulls and out-of-range excluded; hi clamps") {
    val df = Seq[java.lang.Double](0.0, 0.5, 1.0, 3.9, 4.0, -0.1, null)
      .toDF("v")
    // [0,4) in 4 bins: 0.0,0.5 -> bin 0; 1.0 -> bin 1; 3.9 -> bin 3;
    // 4.0 and -0.1 and null excluded
    val got = Relational.histogram(df, "v", 0.0, 4.0, 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got == Seq((0L, 0.0, 1.0, 2L), (1L, 1.0, 2.0, 1L),
      (3L, 3.0, 4.0, 1L)))
  }

  test("single aggregation over one scan — no join, no window") {
    val df = Seq(1.0).toDF("v")
    val plan = Relational.histogram(df, "v", 0.0, 4.0, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(400))
    assert(plan.sliding(9).count(_ == "Exchange ") == 1, plan.take(600))
  }
}

class GroupedStatsSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Relational

  test("grouped histogram bins within each group independently") {
    val df = Seq(("a", 0.5), ("a", 1.5), ("a", 1.6), ("b", 3.5))
      .toDF("g", "v")
    val got = Relational.histogram(df, "v", 0.0, 4.0, 4, Seq("g"))
      .orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    assert(got == Seq(("a", 0L, 1L), ("a", 1L, 2L), ("b", 3L, 1L)))
  }

  test("groupedQuantiles: exact interpolated values, one agg for all qs") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0)).toDF("g", "v")
    val q = Relational.groupedQuantiles(df, Seq("g"), "v",
      Seq(0.5, 0.75))
    val got = q.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // percentile interpolation: pos = (n-1)*q over sorted values
    assert(got(("a", 0.5)) == 2.5 && got(("a", 0.75)) == 3.25)
    assert(got(("b", 0.5)) == 10.0)
    val nAgg = q.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.length
    assert(nAgg == 1, s"expected 1 Aggregate, got $nAgg")
  }
}

class CompactSpec extends SparkSpec {
  import spark.implicits._
  import graft.relational.Layout

  test("many small files compact to ~target-sized few; rows survive") {
    val base = java.nio.file.Files.createTempDirectory("graft_cmp")
      .toString
    val in = s"$base/in"
    val out = s"$base/out"
    (1 to 10000).map(i => (i.toLong, s"payload-$i")).toDF("id", "v")
      .repartition(40).write.parquet(in)
    def parquets(p: String) = new java.io.File(p).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(parquets(in) == 40)
    val n = Layout.compact(spark, in, out, targetBytes = 10L << 20)
    assert(n < 40, s"wrote $n files")
    assert(parquets(out) == n)
    assert(spark.read.parquet(out).count() == 10000L)
  }

  test("in-place compaction is rejected") {
    intercept[IllegalArgumentException] {
      Layout.compact(spark, "/tmp/x", "/tmp/x")
    }
  }
}

/** Market-basket pair mining: hand-computed support/confidence/lift on a
  * three-basket fixture; duplicates inside a basket collapse. */
class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("pair stats match hand computation; threshold filters") {
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"), (1L, "x"), // dup x collapses
      (2L, "x"), (2L, "y"),
      (3L, "x")
    ).toDF("basket", "item")
    val got = graft.relational.Relational
      .marketBasketPairs(rows, "basket", "item", minPairCount = 2L)
      .collect()
    assert(got.length == 1) // only (x,y) reaches 2 baskets
    val r = got.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("x", "y", 2L)))
    assert(r.getDouble(3) == 0.666667) // support 2/3
    assert(r.getDouble(4) == 0.666667) // conf x->y = 2/3
    assert(r.getDouble(5) == 1.0)      // conf y->x = 2/2
    assert(r.getDouble(6) == 1.0)      // lift 2*3/(3*2)
  }

  test("minPairCount below 1 is rejected") {
    intercept[IllegalArgumentException] {
      graft.relational.Relational.marketBasketPairs(
        Seq((1L, "x")).toDF("b", "i"), "b", "i", 0L)
    }
  }
}
