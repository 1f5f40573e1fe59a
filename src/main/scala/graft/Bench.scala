package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times on
  * SPARK_GRAFT_SF_DIR. A full warmup pass runs first on sf0.001 (JIT,
  * whole-stage-codegen compilation, parquet footer caching, shuffle service
  * init) so the timed pass measures steady-state query execution, which is
  * what a long-lived cluster sees. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the repo's global windows are all bounded-by-construction (audited
    // via graft.util.BoundedWindow — see its scaladoc); WindowExec's
    // per-execution warning for them is noise that camouflaged real
    // failures in round 4's bench tail
    graft.util.BoundedWindow.silenceBoundedWindowWarning()

    // noop sink: fully evaluates every output column (count() would let
    // Catalyst prune the projected expressions under count(*), silently
    // timing a plan that skips the work being benchmarked)
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (iteration aid; the
    // driver never sets it, so round benches always cover everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }

    // A failed query must surface, never be timed as a fast success (the
    // round-4 failure mode: 18 broken queries "clocking" 0.06 s). Record
    // the first error per query; failed queries are excluded from timings,
    // reported in an `errors` map, and fail the process (rc != 0).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def jsonSafe(s: String): String =
      s.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
    def recordError(name: String, e: Throwable): Unit =
      if (!errors.contains(name))
        errors(name) = jsonSafe(
          e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse(""))

    // Warmup failures are WARNINGS only (ADVICE r5): the warm dir is a
    // different scale factor, and fixture drift there (a warm-dir-only
    // schema mismatch) must not exclude a query whose timed iterations at
    // the bench scale all succeed — only timed-pass errors fail the run.
    val warmupErrors = scala.collection.mutable.LinkedHashMap[String, String]()
    val warmDir = "/root/testdata/sf0.001"
    queries.foreach { case (name, fn) =>
      try run(fn(spark, warmDir))
      catch { case e: Throwable =>
        if (!warmupErrors.contains(name))
          warmupErrors(name) = jsonSafe(e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse(""))
      }
    }

    // three timed iterations, min per query: steady-state time without
    // GC/scheduler/co-tenant noise (observed ±40% between runs on this
    // box); cache cleared between so nothing rides a previous iteration's
    // persisted intermediates
    val iterations = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { run(fn(spark, sfDir)); true }
          catch { case e: Throwable => recordError(name, e); false }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }
    }
    val results = queries.keys.flatMap { name =>
      val times = iterations.flatMap(_(name))
      // only queries that succeeded every timed iteration count as timed
      if (times.size == iterations.size && !errors.contains(name))
        Some(name -> times.min)
      else None
    }.toMap
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // ---- scale-stress block (VERDICT r5 #2, r6 #2) ----------------------
    // Each StressBench query runs at ×1 and at ×SPARK_GRAFT_STRESS
    // (default 16) so every round's bench artifact carries the measured
    // ratio vs linear scaling for the banded/binned/distributed paths.
    // MIN-OF-N per (query, scale) — round-6's same-code runs disagreed up
    // to 2.3× on single-pass stress rows (10.3× vs 23.3× for the same
    // ratio), so single passes can't gate a scale regression; the min
    // strips GC/compaction noise and per-iteration times are persisted in
    // BENCH_DETAIL.json for noise audits. SPARK_GRAFT_STRESS_ITERS tunes
    // the repeat count (default 3; the block triples, which is the price
    // of gate-worthy rows). SPARK_GRAFT_ONLY filters stress queries by
    // their s_ names like the main set (iteration aid);
    // SPARK_GRAFT_STRESS=0 disables. Stress failures fail the run like
    // timed ones.
    val stressScale = sys.env.getOrElse("SPARK_GRAFT_STRESS", "16").toInt
    val stressIters = sys.env.getOrElse("SPARK_GRAFT_STRESS_ITERS", "3").toInt
    val stressSelected = (only match {
      case Some(names) => StressBench.queries.filter(kv => names(kv._1))
      case None => StressBench.queries
    }).toSeq.sortBy(_._1)
    def timeStress(reps: Int): Map[String, Seq[Double]] =
      stressSelected.flatMap { case (name, fn) =>
        val times = (1 to stressIters).flatMap { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try { run(fn(spark, sfDir, reps))
            Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable => recordError(s"$name@x$reps", e); None }
        }
        // all iterations must succeed for the row to count (a partial
        // min could mask an intermittent failure as a fast run)
        if (times.size == stressIters) Some(name -> times) else None
      }.toMap
    val (stressBaseIters, stressBigIters) =
      if (stressScale > 1 && stressSelected.nonEmpty) {
        // warmup at the small dir so the ×1 pass doesn't absorb JIT /
        // codegen compilation cost that the ×scale pass then skips —
        // the ratio between the two passes is the artifact
        stressSelected.foreach { case (name, fn) =>
          try run(fn(spark, warmDir, 1))
          catch { case e: Throwable =>
            if (!warmupErrors.contains(name))
              warmupErrors(name) = jsonSafe(e.getClass.getSimpleName + ": " +
                Option(e.getMessage).getOrElse(""))
          }
        }
        (timeStress(1), timeStress(stressScale))
      } else (Map.empty[String, Seq[Double]], Map.empty[String, Seq[Double]])
    val stressBase = stressBaseIters.map { case (k, v) => k -> v.min }
    val stressBig = stressBigIters.map { case (k, v) => k -> v.min }
    def fmt(entries: Iterable[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    def fmtErr(entries: Iterable[(String, String)]): String = entries
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // Full per-query detail goes to a file; the stdout contract line is
    // kept under ~1500 chars (total + the slowest 50 queries, 3 dp) so it
    // survives log-tail truncation downstream. The omitted queries are
    // all in the flat ~0.1 s floor.
    // ---- online (row-at-a-time) serving micro-bench ---------------------
    // The reference's online deploy mode scores one-row frames through its
    // exported graph (RunBench.py:41,66-77); the analog here is
    // OnlineScorer's compiled closure chain over frozen fitted state. Fit
    // the OnlineScorerSpec pipeline (9 stages: concat/map/label/freq/
    // target/hash/agg/scaler/one-hot) once at the bench SF, then measure
    // single-row scoring throughput driver-side — no Spark job per call.
    val onlineRps: Double =
      if (!only.forall(_.contains("online"))) 0.0
      else try {
        import graft.operators._
        val customer = spark.read.parquet(s"$sfDir/customer.parquet")
        val model = DFPipeline(
          new StringConcatenator(Seq(Seq("c_mktsegment", "c_nationkey")),
            Seq("ckey"), "_"),
          new MapTransformer(Seq("c_mktsegment"), Seq("seg_short"),
            Seq(("BUILDING", "B"), ("AUTOMOBILE", "A")),
            defaultValue = Some("other")),
          new ComplementLabelEncoder(Seq("ckey"), Seq("ckey_code")),
          new FrequencyEncoder(Seq("c_mktsegment"), Seq("seg_freq"),
            normalize = true),
          new TargetEncoder(Seq("c_mktsegment"), Seq("seg_te"),
            targetCol = "c_acctbal", idCol = "c_custkey",
            nFolds = 4, smoothing = 10.0),
          new HashingEncoder(Seq("c_name"), Seq("name_bucket"), 64),
          new Aggregator(Seq("c_acctbal"), Seq("bal_mean"), Nil, "mean"),
          new Scaler(Seq("c_acctbal"), Seq("bal_std"), "standard"),
          new OneHotEncoder(Seq("seg_short"))).fit(customer)
        val score = OnlineScorer.compile(model)
        val inputCols = customer.columns
        val rows = customer.limit(1000).collect()
          .map(r => inputCols.map(c => c -> r.getAs[Any](c)).toMap)
        rows.foreach(score) // JIT warmup
        val t0 = System.nanoTime()
        var reps = 0
        while (reps < 20) { rows.foreach(score); reps += 1 }
        (20.0 * rows.length) / ((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => recordError("online_serving", e); 0.0
      }

    def fmtIters(entries: Iterable[(String, Seq[Double])]): String = entries
      .map { case (k, v) =>
        "\"" + k + "\":[" + v.map(t => f"$t%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val stressJson =
      s""""stress":{"scale":$stressScale,"iters":$stressIters,"base":${fmt(stressBase)},"scaled":${fmt(stressBig)},"base_iters":${fmtIters(stressBaseIters)},"scaled_iters":${fmtIters(stressBigIters)}},"online_rows_per_sec":${f"$onlineRps%.0f"}"""
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"errors":${fmtErr(errors)},"warmup_errors":${fmtErr(warmupErrors)},$stressJson,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        detail.getBytes("UTF-8"))
      // append-only archive: BENCH_DETAIL.json is overwritten per run, so
      // each round's full per-query map would otherwise be lost (the
      // summary line's query list is truncated downstream)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        (detail + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () }
    // Compact contract line (VERDICT r6 #5): round 6's line carried the
    // top-50 queries plus the full inline stress block and outgrew the
    // driver's tail capture (BENCH_r06 parsed:null). Keep it under ~1 KB:
    // top-20 slowest, first 10 errors (n_failed has the true count), and
    // the stress block BY REFERENCE — full per-query stress minimums and
    // per-iteration arrays live in BENCH_DETAIL.json / BENCH_HISTORY.jsonl.
    val slowest = results.toSeq.sortBy(-_._2).take(20)
    val stressRef =
      s""""stress":{"scale":$stressScale,"iters":$stressIters,"n_base":${stressBase.size},"n_scaled":${stressBig.size},"detail":"BENCH_DETAIL.json"}"""
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","n_queries":${results.size},"n_failed":${errors.size},"queries":${fmt(slowest)},"errors":${fmtErr(errors.take(10))},"n_warmup_errors":${warmupErrors.size},$stressRef,"online_rows_per_sec":${f"$onlineRps%.0f"},"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
