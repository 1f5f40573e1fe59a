package graft

import graft.relational.Relational
import org.apache.spark.sql.functions._

class IntervalSpec extends SparkSpec {
  import spark.implicits._

  private def spansOf(rows: Seq[(String, Long, Long)]) =
    Relational.mergeIntervals(rows.toDF("k", "s", "en"), Seq("k"), "s", "en")
      .orderBy("k", "span_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList

  test("overlapping and touching intervals chain into one span") {
    val got = spansOf(Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L), // touch merges
      ("a", 40L, 50L)))
    assert(got == List(("a", 0L, 30L, 3L), ("a", 40L, 50L, 1L)))
  }

  test("a nested long interval swallows later starts (cummax, not lag)") {
    // [0,100] then [10,20], [30,40]: lag(end) would see 20 < 30 and
    // wrongly open a new span at 30
    val got = spansOf(Seq(
      ("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L), ("a", 150L, 160L)))
    assert(got == List(("a", 0L, 100L, 3L), ("a", 150L, 160L, 1L)))
  }

  test("inverted intervals drop; keys stay independent") {
    val got = spansOf(Seq(
      ("a", 5L, 3L),          // dropped
      ("a", 0L, 10L),
      ("b", 5L, 15L), ("b", 12L, 20L)))
    assert(got == List(("a", 0L, 10L, 1L), ("b", 5L, 20L, 2L)))
  }

  test("coverage sums merged spans, never double-counts overlap") {
    val df = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // covered 20
      ("a", 100L, 110L),                 // +10
      ("b", 0L, 1L)).toDF("k", "s", "en")
    val got = Relational.intervalCoverage(df, Seq("k"), "s", "en")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("a" -> (30L, 2L), "b" -> (1L, 1L)))
  }

  test("zero-length intervals participate (point coverage)") {
    val got = spansOf(Seq(("a", 5L, 5L), ("a", 5L, 10L), ("a", 11L, 12L)))
    assert(got == List(("a", 5L, 10L, 2L), ("a", 11L, 12L, 1L)))
  }
}
