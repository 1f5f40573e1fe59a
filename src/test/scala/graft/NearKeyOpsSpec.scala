package graft

import org.apache.spark.sql.functions._

import graft.relational.Relational

class EditDistancePairsSpec extends SparkSpec {
  import spark.implicits._

  test("finds substitution/insert/delete pairs; rejects transpositions") {
    val df = Seq("cat", "cut", "cart", "at", "dog", "tac", "act")
      .toDF("s")
    val got = Relational.editDistancePairs(df, "s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("cat", "cut"),   // substitution
      ("cart", "cat"),  // one deletion
      ("at", "cat"),    // one insertion
      ("act", "at")),   // one deletion
      "exact ed<=1 pairs only")
    assert(!got.contains(("act", "tac")), "transposition is ed 2")
    assert(!got.contains(("cat", "tac")), "transposition is ed 2")
  }

  test("duplicate rows collapse; long strings excluded by maxLen") {
    val df = Seq("aa", "aa", "ab", "x" * 100, "x" * 100 + "y").toDF("s")
    val got = Relational.editDistancePairs(df, "s", maxLen = 64)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("aa", "ab")))
  }

  test("agrees with brute-force levenshtein on a generated id set") {
    val ids = (0 until 60).map(i => f"item#$i%03d")
    val df = ids.toDF("s")
    val got = Relational.editDistancePairs(df, "s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = (for {
      a <- ids; b <- ids if a < b
      if levDist(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == brute)
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
  test("fuzzyJoin equals the brute-force cross-product filter at d=1 " +
      "and d=2 on random short strings") {
    val rnd = new scala.util.Random(7)
    def randStr() = (1 to (rnd.nextInt(6) + 2))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val ls = (1 to 40).map(_ => randStr()).distinct
    val rs = (1 to 40).map(_ => randStr()).distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (dd <- Seq(1, 2)) {
      val got = Relational.fuzzyJoin(ls.toDF("x"), rs.toDF("y"),
          "x", "y", maxDist = dd)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getInt(2))).sorted.toSeq
      val expect = (for { a <- ls; b <- rs; d = lev(a, b) if d <= dd }
        yield (a, b, d)).sorted
      assert(got == expect, s"d=$dd")
    }
  }

  test("fuzzyJoin drops over-length strings and nulls from BOTH sides") {
    val l = Seq(Some("abc"), Some("a" * 40), None).toDF("x")
    val r = Seq("abd").toDF("y")
    val got = Relational.fuzzyJoin(l, r, "x", "y", maxDist = 1,
      maxLen = 32).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("abc", "abd")))
  }

  test("fuzzyJoin hot-variant cap: an adversarial one-variant group is " +
      "dropped under the cap (bounded work), kept above it — and the " +
      "default cap never engages on realistic vocabularies") {
    // {P + c : 8 chars} — all 8 strings share exactly ONE variant (P):
    // uncapped they form the full 8x8 substitution clique
    val grp = "abcdefgh".map(c => s"0000$c")
    val clique = (for { a <- grp; b <- grp if a != b } yield (a, b)).size
    val uncapped = Relational.fuzzyJoin(grp.toDF("x"), grp.toDF("y"),
      "x", "y", maxDist = 1).filter(col("a") =!= col("b")).count()
    assert(uncapped == clique, "default cap must not engage")
    // cap 4 < 8: the shared variant drops; pairs witnessed only by it
    // are lost by design (self-matches survive via their full-string
    // variant buckets of size 1)
    val capped = Relational.fuzzyJoin(grp.toDF("x"), grp.toDF("y"),
      "x", "y", maxDist = 1, maxVariantBucket = 4)
    assert(capped.filter(col("a") =!= col("b")).count() == 0)
    assert(capped.filter(col("a") === col("b")).count() == grp.size.toLong)
  }

  test("editDistancePairs hot-variant cap drops the adversarial bucket; " +
      "pairs with independent witnesses survive") {
    val grp = "abcdefgh".map(c => s"0000$c") :+ "0000" // "0000" pairs by deletion
    val capped = Relational.editDistancePairs(grp.toDF("s"),
      "s", maxVariantBucket = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the 8-string substitution clique loses its only witness ("0000"
    // appears as a VARIANT of all 8 — over the cap); but ("0000", P+c)
    // deletion pairs are witnessed by the full-string variant of "0000"
    // itself... which IS the same hot bucket — all dropped here
    assert(capped.isEmpty)
    val uncapped = Relational.editDistancePairs(grp.toDF("s"), "s")
      .collect().length
    assert(uncapped == (8 * 7) / 2 + 8, "default cap must not engage: " +
      "28 substitution pairs + 8 deletion pairs")
  }
}

class RollingActiveUsersSpec extends SparkSpec {
  import spark.implicits._

  test("window=1 is plain DAU; duplicates collapse") {
    val df = Seq((1L, 10L), (1L, 10L), (2L, 10L), (1L, 11L))
      .toDF("u", "d")
    val got = Relational.rollingActiveUsers(df, "u", "d", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 2L, 11L -> 1L))
  }

  test("trailing window counts each user once; clipped at max period") {
    // user 1 active on 10 and 11; user 2 on 10 only; window 3
    val df = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("u", "d")
    val got = Relational.rollingActiveUsers(df, "u", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // period 10: both; 11: both (u2 from day 10 still in window);
    // periods 12+ clipped at max observed period 11
    assert(got == Map(10L -> 2L, 11L -> 2L))
  }

  test("gap periods inside the span appear only if some user covers them") {
    val df = Seq((1L, 10L), (2L, 14L)).toDF("u", "d")
    val got = Relational.rollingActiveUsers(df, "u", "d", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10,11 from user1; 14 from user2 (15 clipped); 12,13 uncovered
    assert(got == Map(10L -> 1L, 11L -> 1L, 14L -> 1L))
  }
}

class GroupedPercentileRankSpec extends SparkSpec {
  import spark.implicits._

  test("per-group ECDF matches Spark's percent_rank within each group") {
    val df = (1 to 120).map(i => (s"g${i % 3}", (i % 11).toDouble))
      .toDF("g", "v")
    val viaOp = Relational.percentileRank(df, "v", "pr", Seq("g"))
      .select("g", "v", "pr").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val viaWindow = df.withColumn("pr", percent_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy("v")))
      .select("g", "v", "pr").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(viaOp == viaWindow)
  }
}
