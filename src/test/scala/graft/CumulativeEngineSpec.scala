package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.relational.CumulativeEngine

/** The unified strictly-below cumulative engine (round 7: one engine
  * behind percentileRank AND the Eval ranking family) — exactness of
  * the binned path against the small path, and plan-shape pins so a
  * refactor that adds an exchange or a global window to the widest
  * shared 100-TB path fails HERE, not in a bench artifact two rounds
  * later. Inputs are localCheckpoint'ed so the plans under test are
  * the ENGINE's plans, not the fixture lineage. */
class CumulativeEngineSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // distinct-value relation with a long and a double measure, exercising
  // duplicate-heavy and skewed values
  private def counts(n: Int, groups: Int = 0): DataFrame = {
    val rows = (1 to n).map { i =>
      val g = if (groups == 0) "g" else s"g${i % groups}"
      (g, i * 7 % 997 + (if (i % 13 == 0) 100000 else 0),
        (i % 5 + 1).toLong, (i % 3 + 1) * 0.5)
    }
    rows.toDF("g", "__v", "__n", "__m")
      .groupBy("g", "__v")
      .agg(sum("__n").as("__n"), sum("__m").as("__m"))
      .localCheckpoint(true)
  }

  test("binned path is bit-identical to the small path — both measures " +
      "(long count + double mass), ungrouped and grouped") {
    for (groups <- Seq(0, 4)) {
      val gcols = if (groups == 0) Nil else Seq("g")
      val c = counts(600, groups)
      def run(small: Boolean) =
        CumulativeEngine.strictlyBelow(c, "__v", Seq("__n", "__m"),
          gcols, small)
          .select((gcols.map(col) :+ col("__v") :+
            col("__below___n") :+ col("__below___m")): _*)
          .collect().map { r =>
            val off = gcols.size
            val key = (if (off == 0) "g" else r.getString(0),
              r.getInt(off))
            key -> (r.getLong(off + 1), r.getDouble(off + 2))
          }.toMap
      val smallR = run(small = true)
      val binnedR = run(small = false)
      assert(smallR == binnedR && smallR.nonEmpty,
        s"groups=$groups: binned != small")
    }
  }

  test("binned ungrouped plan: exactly TWO windows (cross-bin offsets " +
      "over <=4096 bins + within-bin partitioned by __bin), no shuffle " +
      "join, and the bin fan-out bounded at 2 hash exchanges") {
    val c = counts(600)
    val p = plan(CumulativeEngine.strictlyBelow(c, "__v", Seq("__n"),
      Nil, small = false))
    assert("Window \\[".r.findAllIn(p).size == 2, p.take(1500))
    // the distinct-value window partitions by __bin — parallel, never a
    // global sort over the distinct relation
    assert(p.contains("[__bin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("CartesianProduct"), p.take(1500))
    // shuffles: the offsets groupBy(__bin) + the within-bin window
    // partitioning (AQE may reuse); a third means the engine grew a pass
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"engine gained a shuffle:\n" + p.take(1500))
    // single-partition exchanges: the one-row bounds aggregate (appears
    // in BOTH the binned-side and offsets-side subtrees pre-AQE — the
    // canonical-equal exchanges collapse to one via ReuseExchange at
    // runtime over the persisted input) + the <=4096-row offsets
    // cumulative — a fourth means the engine grew a global funnel over
    // the distinct relation
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 3,
      s"engine gained a global funnel:\n" + p.take(1500))
  }

  test("binned grouped plan: windows partition by (g, __bin); no " +
      "cartesian; per-group edges ride ONE groups-sized aggregate") {
    val c = counts(600, groups = 4)
    val p = plan(CumulativeEngine.strictlyBelow(c, "__v", Seq("__n"),
      Seq("g"), small = false))
    assert("Window \\[".r.findAllIn(p).size == 2, p.take(1500))
    assert(p.contains("[g#") && p.contains("__bin"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("small path: ONE window, no join, no hash exchange") {
    val c = counts(600)
    val p = plan(CumulativeEngine.strictlyBelow(c, "__v", Seq("__n"),
      Nil, small = true))
    assert("Window \\[".r.findAllIn(p).size == 1, p.take(800))
    assert(!p.contains("Join"), p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 0,
      p.take(800))
  }

  test("heavy skew: one value holding half the distinct-relation mass " +
      "still bins exactly (the quantile-balanced macro edges put the " +
      "outlier alone in the top bins)") {
    val rows = ((1 to 400).map(i => ("g", i, 1L, 1.0)) ++
      Seq(("g", 10000000, 200L, 200.0))).toDF("g", "__v", "__n", "__m")
      .groupBy("g", "__v").agg(sum("__n").as("__n"), sum("__m").as("__m"))
      .localCheckpoint(true)
    def run(small: Boolean) =
      CumulativeEngine.strictlyBelow(rows, "__v", Seq("__n"), Nil, small)
        .select(col("__v"), col("__below___n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(run(small = true) == run(small = false))
  }
}
