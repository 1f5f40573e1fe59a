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
