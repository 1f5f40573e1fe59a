package graft

import org.apache.spark.sql.functions._

import graft.relational.Relational

/** CDC operators: log compaction to latest-per-key and keyed snapshot
  * diffing. */
class LatestByKeySpec extends SparkSpec {
  import spark.implicits._

  test("latest row per key by (order, tie); full payload carried") {
    val log = Seq(
      (1L, 10L, "a", 1.0), (1L, 30L, "c", 3.0), (1L, 20L, "b", 2.0),
      (2L, 5L, "x", 9.0),
      (3L, 7L, "m", 4.0), (3L, 7L, "n", 5.0) // order tie -> tie col wins
    ).toDF("k", "ts", "tag", "v")
    val got = Relational.latestByKey(log, Seq("k"), "ts", Seq("tag"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2),
        r.getDouble(3)))).toMap
    assert(got(1L) == ((30L, "c", 3.0)))
    assert(got(2L) == ((5L, "x", 9.0)))
    assert(got(3L) == ((7L, "n", 5.0))) // ts tie broken by larger tag
  }

  test("compacts via ONE aggregation — no Window in the plan") {
    val log = Seq((1L, 1L, "a")).toDF("k", "ts", "tag")
    val plan = Relational.latestByKey(log, Seq("k"), "ts", Seq("tag"))
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    assert(plan.collect { case w: Window => w }.isEmpty, "window funnel")
    assert(plan.collect { case a: Aggregate => a }.nonEmpty)
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (4L, null.asInstanceOf[String], 40.0)
  ).toDF("k", "s", "v")

  test("insert/delete/update classified; unchanged rows dropped") {
    val newSnap = Seq(
      (1L, "a", 10.0),  // unchanged -> dropped
      (2L, "B", 20.0),  // update (string change)
      (4L, "d", 40.0),  // update (null -> value, null-safe compare)
      (5L, "e", 50.0)   // insert; key 3 missing -> delete
    ).toDF("k", "s", "v")
    val got = Relational.snapshotDiff(oldSnap, newSnap, Seq("k"),
        Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "update",
      5L -> "insert"))
  }

  test("old/new values carried; delete has null new side") {
    val newSnap = Seq((5L, "e", 50.0)).toDF("k", "s", "v")
    val rows = Relational.snapshotDiff(oldSnap, newSnap, Seq("k"),
        Seq("s", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), r.isNullAt(4))).toMap
    assert(rows(3L) == (("delete", Some("c"), true)))
    assert(rows(5L)._1 == "insert")
    val ins = Relational.snapshotDiff(oldSnap, newSnap, Seq("k"),
      Seq("s", "v")).filter(col("k") === 5L).head()
    assert(ins.isNullAt(2) && ins.getString(4) == "e")
  }
}

/** Mergeable aggregate state: maintained-from-deltas must equal a full
  * recompute bit-for-bit, in any merge order, with nulls skipped. */
class AggMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", Some(3L), 1), ("a", Some(7L), 1), ("a", None, 2),
    ("b", Some(5L), 1), ("b", Some(1L), 2), ("b", Some(9L), 3),
    ("c", Some(4L), 3)
  ).toDF("k", "v", "batch")

  private def st(b: Int) =
    Relational.aggState(rows.filter(col("batch") === b), Seq("k"), "v")

  private def fin(df: org.apache.spark.sql.DataFrame) =
    Relational.aggFinalize(df, Seq("k")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

  test("merge of batch states == full recompute, and nulls are skipped") {
    val full = fin(Relational.aggState(rows, Seq("k"), "v"))
    val maintained = fin(Relational.aggMerge(
      Relational.aggMerge(st(1), st(2), Seq("k")), st(3), Seq("k")))
    assert(maintained == full)
    assert(full("a") == ((2L, 10L, 3L, 7L, 5.0))) // the null row is gone
    assert(full("b") == ((3L, 15L, 1L, 9L, 5.0)))
  }

  test("merge is associative: (1+2)+3 == 1+(2+3)") {
    val left = fin(Relational.aggMerge(
      Relational.aggMerge(st(1), st(2), Seq("k")), st(3), Seq("k")))
    val right = fin(Relational.aggMerge(st(1),
      Relational.aggMerge(st(2), st(3), Seq("k")), Seq("k")))
    assert(left == right)
  }

  test("a key only present in the delta appears after maintenance") {
    val m = fin(Relational.aggMerge(st(1), st(3), Seq("k")))
    assert(m("c") == ((1L, 4L, 4L, 4L, 4.0)))
    assert(!fin(st(1)).contains("c"))
  }
}

/** SCD2 dimension build: validity intervals per key from a change log. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"),  // no-op: same state
    (1L, 30L, 3L, "b"), (1L, 40L, 4L, "a"),  // back to a = NEW version
    (2L, 5L, 5L, "x")
  ).toDF("k", "ts", "id", "state")

  private def versions = Relational.scd2(log, Seq("k"), "ts",
    Seq("state"), Seq("id"))

  test("runs become versions; no-ops never open one; current is open") {
    val got = versions.orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toList == List(
      (1L, "a", 10L, Some(30L)),
      (1L, "b", 30L, Some(40L)),
      (1L, "a", 40L, None),
      (2L, "x", 5L, None)))
  }

  test("point-in-time lookup over [from, to) reconstructs the log") {
    val v = versions
    def stateAt(k: Long, t: Long): Option[String] = v
      .filter(col("k") === k && col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .collect().map(_.getString(1)).headOption
    assert(stateAt(1L, 10L).contains("a"))
    assert(stateAt(1L, 29L).contains("a"))
    assert(stateAt(1L, 30L).contains("b"))
    assert(stateAt(1L, 99L).contains("a"))
    assert(stateAt(1L, 9L).isEmpty) // before first version
    // intervals tile: exactly one version covers any t >= first ts
    val overlaps = v.as("a").join(v.as("b"),
      col("a.k") === col("b.k") &&
        col("a.valid_from") < col("b.valid_from") &&
        (col("a.valid_to").isNull ||
          col("a.valid_to") > col("b.valid_from")))
    assert(overlaps.isEmpty)
  }

  test("latest open version per key agrees with latestByKey") {
    val open = versions.filter(col("valid_to").isNull)
      .select(col("k"), col("state")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val latest = Relational.latestByKey(
      log.select("k", "ts", "id", "state"), Seq("k"), "ts", Seq("id"))
      .select(col("k"), col("state")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(open == latest)
  }
}

/** Point-in-time join against an SCD2 dimension. */
class PitJoinSpec extends SparkSpec {
  import spark.implicits._

  // dim with a GAP for key 1: [10,20) then [40,null) — nothing valid in
  // [20,40)
  private val dim = Seq(
    (1L, "a", 10L, Some(20L)), (1L, "c", 40L, None),
    (2L, "x", 5L, None)
  ).toDF("k", "state", "valid_from", "valid_to")

  private def lookup(rows: (Long, Long, Long)*): Map[Long, Option[String]] = {
    val facts = rows.toSeq.toDF("fid", "k", "t")
    Relational.pitJoin(facts, dim, Seq("k"), "t", Seq("state"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
  }

  test("boundary semantics: from-inclusive, to-exclusive; gaps null") {
    val got = lookup(
      (1L, 1L, 10L),  // == valid_from -> matches "a"
      (2L, 1L, 19L),  // inside -> "a"
      (3L, 1L, 20L),  // == valid_to -> EXPIRED, gap -> null
      (4L, 1L, 39L),  // still in the gap -> null
      (5L, 1L, 40L),  // next version opens -> "c"
      (6L, 1L, 999L), // open-ended current -> "c"
      (7L, 1L, 9L),   // before first version -> null
      (8L, 2L, 100L), // other key
      (9L, 3L, 50L))  // unknown key -> null
    assert(got == Map(1L -> Some("a"), 2L -> Some("a"), 3L -> None,
      4L -> None, 5L -> Some("c"), 6L -> Some("c"), 7L -> None,
      8L -> Some("x"), 9L -> None))
  }

  test("composes with scd2: every fact gets its log state at t") {
    val log = Seq((1L, 10L, 1L, "a"), (1L, 30L, 2L, "b"),
      (1L, 50L, 3L, "a")).toDF("k", "ts", "id", "state")
    val d2 = Relational.scd2(log, Seq("k"), "ts", Seq("state"), Seq("id"))
    val facts = Seq((1L, 1L, 15L), (2L, 1L, 30L), (3L, 1L, 49L),
      (4L, 1L, 60L)).toDF("fid", "k", "t")
    val got = Relational.pitJoin(facts, d2, Seq("k"), "t", Seq("state"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "b", 4L -> "a"))
  }
}
