package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: per-query wall times on SPARK_GRAFT_SF_DIR, emitted
  * INCREMENTALLY. A full warmup pass runs first on sf0.001 (JIT,
  * whole-stage-codegen compilation, parquet footer caching, shuffle service
  * init) so the timed pass measures steady-state query execution, which is
  * what a long-lived cluster sees.
  *
  * Phase order is PROBE-GATED (VERDICT r8 #1): the bench box is a shared
  * host whose effective speed was measured to swing >1.6x within an hour,
  * and round 8's official run landed on the worst phase — n_iters degraded
  * to 1 AND 41/44 stress rows were budget-skipped, leaving no usable scale
  * evidence. The stress RATIOS are box-insensitive (both sides of a ratio
  * run minutes apart) while raw main seconds are not, so on a slow box the
  * complete stress table is worth more than extra main iterations:
  *
  *   1. warmup (sf0.001, untimed, parallel pool, budget-scaled timeout)
  *      -> EMIT
  *   2. timed main iterations -> EMIT after EVERY iteration.
  *      Fast box (start probe <= 2.2 s): up to 3 iterations,
  *      budget-adaptive as before. Slow box: exactly ONE pass here —
  *      extra iterations move BEHIND the stress block (phase 5).
  *   3. online serving micro-bench -> EMIT
  *   4. stress rows one at a time (x1 then xscale per row) -> EMIT per row.
  *      Fast box: min-of-2 per cell; slow box: single pass (the ratio is
  *      the artifact, and one complete table beats half a min-of-2 one).
  *   5. leftover-budget main iterations (slow box, or a fast box that
  *      stopped early): re-run the full main suite while it fits, folding
  *      new minima into `queries` -> EMIT per iteration.
  *
  * Every emission rewrites BENCH_DETAIL.json ATOMICALLY (temp file +
  * ATOMIC_MOVE — a wall-clock kill mid-write must never truncate the
  * artifact, ADVICE r8) and prints the compact contract line, so a kill at
  * any point leaves the latest completed phase parseable.
  *
  * SPARK_GRAFT_BUDGET_SEC (default 2700 = 45 min) is the soft budget;
  * rows/iterations skipped for budget are REPORTED (never silent) in
  * `skipped_stress` / `n_iters`. */
object Bench {
  /** Deterministic single-thread CPU probe (~1e9 xorshift steps): the
    * box is a shared host whose effective CPU speed was MEASURED to
    * swing >1.6x within an hour (round-8 bisect of the round-7 "uniform
    * 1.47x drift" — an identical Python loop went 3.37 s -> 5.58 s in 38
    * minutes on an idle VM; an identical 14-query suite went 43 s -> 68 s
    * across four same-config runs). Emitting the probe at phase
    * boundaries makes every bench artifact self-normalizing: divide
    * totals by the calibration ratio before comparing rounds. */
  private def xorshiftSteps(steps: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < steps) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
    }
    x
  }

  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    val x = xorshiftSteps(1000000000L)
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 42L) println("") // defeat dead-code elimination
    dt
  }

  /** PARALLEL probe (VERDICT r8 #2): the same xorshift loop on one thread
    * per requested core, wall time until ALL finish. Round 8 proved the
    * scalar probe under-corrects a 32-way workload by up to ~10x on
    * fit-heavy queries — the shared host's parallel throughput collapses
    * far more than its scalar speed when co-tenants land. This probe IS a
    * 32-way workload, so its ratio tracks what the timed queries actually
    * experience; tools/normalize_bench.py prefers it when both artifacts
    * carry one. */
  private def calibratePar(threads: Int): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = (1 to threads).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = xorshiftSteps(1000000000L)
      })
    }
    var acc = 0L
    futs.foreach(f => acc ^= f.get())
    val dt = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    if (acc == 42L) println("") // defeat dead-code elimination
    dt
  }

  def main(args: Array[String]): Unit = {
    val benchStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchStart) / 1e9
    val budget = sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "2700").toDouble

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val probeThreads =
      math.max(2, math.min(cpus.toInt, Runtime.getRuntime.availableProcessors))

    // named probe points: start, pre_main, pre_stress, end — each records
    // BOTH probes so normalize_bench.py can correct per-phase (r8's single
    // start/end pair could not distinguish "main ran fast, stress ran on a
    // collapsed box" from a uniformly slow run)
    val calibScalar = scala.collection.mutable.LinkedHashMap[String, Double]()
    val calibPar = scala.collection.mutable.LinkedHashMap[String, Double]()
    def probe(label: String): Unit = {
      calibScalar(label) = calibrate()
      calibPar(label) = calibratePar(probeThreads)
    }
    probe("start")
    // SPARK_GRAFT_FAST_BOX=0/1 pins the policy (testing aid; the driver
    // never sets it, so round benches always probe-gate)
    val fastBox = sys.env.get("SPARK_GRAFT_FAST_BOX")
      .map(_ == "1").getOrElse(calibScalar("start") <= 2.2)

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

    // ---- mutable result state shared by the emitters -------------------
    var results = Map.empty[String, Double]
    var nIters = 0
    var onlineRps = 0.0
    val notes = scala.collection.mutable.ArrayBuffer[String]()
    val stressScale = sys.env.getOrElse("SPARK_GRAFT_STRESS", "16").toInt
    // min-of-2 by default (VERDICT r7 #1b): SCALE.md's two-run table marks
    // 28/35 rows stable under min-of-3, and the flagged rest are floor-
    // noisy sub-second rows that extra iterations don't stabilize either —
    // the third iteration bought little and cost ~1/3 of the block.
    // Probe-gated: on a measured SLOW box phase a full min-of-2 block
    // cannot fit the hour alongside the main pass, and a COMPLETE
    // single-pass stress table beats half a min-of-2 one — the ratio
    // column is what gates.
    val stressIters = sys.env.get("SPARK_GRAFT_STRESS_ITERS").map(_.toInt)
      .getOrElse(if (fastBox) 2 else 1)
    val stressScale0 = stressScale
    val stressSelected0 = (only match {
      case Some(names) => StressBench.queries.filter(kv => names(kv._1))
      case None => StressBench.queries
    }).toSeq.sortBy(_._1)
    val stressBaseIters =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val stressBigIters =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val skippedStress = scala.collection.mutable.ArrayBuffer[String]()
    val phaseSec = scala.collection.mutable.LinkedHashMap[String, Double]()

    def fmt(entries: Iterable[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    def fmtErr(entries: Iterable[(String, String)]): String = entries
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    def fmtIters(entries: Iterable[(String, Seq[Double])]): String = entries
      .map { case (k, v) =>
        "\"" + k + "\":[" + v.map(t => f"$t%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    def fmtInt(entries: Iterable[(String, Int)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def fmtStr(entries: Iterable[String]): String =
      entries.map("\"" + _ + "\"").mkString("[", ",", "]")

    /** Emit the current state: full detail to BENCH_DETAIL.json (atomic
      * temp-file + move — never a truncated artifact, ADVICE r8), compact
      * contract line (<~1 KB) to stdout. Called after every phase AND
      * every main iteration so a wall-clock kill always leaves the latest
      * completed unit parseable (the driver's tail capture keeps the LAST
      * line). */
    def emit(phase: String, stdout: Boolean = true,
        history: Boolean = false): Unit = {
      val total = if (results.nonEmpty) results.values.sum else 0.0
      val stressBase = stressBaseIters.map { case (k, v) => k -> v.min }
      val stressBig = stressBigIters.map { case (k, v) => k -> v.min }
      val scalesJson = fmtInt(StressBench.scaleOverride.toSeq.sortBy(_._1))
      val skippedJson = fmtStr(skippedStress)
      val stressJson =
        s""""stress":{"scale":$stressScale,"iters":$stressIters,"scales":$scalesJson,"skipped":$skippedJson,"base":${fmt(stressBase)},"scaled":${fmt(stressBig)},"base_iters":${fmtIters(stressBaseIters)},"scaled_iters":${fmtIters(stressBigIters)}},"online_rows_per_sec":${f"$onlineRps%.0f"}"""
      val calibJson =
        s""""calib_sec":${fmt(calibScalar)},"calib_par_sec":${fmt(calibPar)},"probe_threads":$probeThreads,"fast_box":$fastBox"""
      val fitJson = fmt(graft.util.FitMemo.fitSeconds.toSeq.sortBy(_._1))
      val notesJson = fmtStr(notes.map(jsonSafe))
      val detail = s"""{"phase":"$phase","elapsed_sec":${f"$elapsed%.1f"},"phase_sec":${fmt(phaseSec)},$calibJson,"fit_sec":$fitJson,"notes":$notesJson,"metric":"total","value":$total,"unit":"sec","n_iters":$nIters,"queries":${fmt(results)},"errors":${fmtErr(errors)},"warmup_errors":${fmtErr(warmupErrors)},$stressJson,"sf":"$sfDir"}"""
      try {
        val dir = java.nio.file.Paths.get(".")
        val tmp = java.nio.file.Files.createTempFile(dir, ".bench_detail", ".tmp")
        java.nio.file.Files.write(tmp, detail.getBytes("UTF-8"))
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get("BENCH_DETAIL.json"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // append-only archive: BENCH_DETAIL.json is overwritten per run /
        // per phase; the final phase line per run is the durable record
        if (history)
          java.nio.file.Files.write(
            java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
            (detail + "\n").getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
      } catch { case _: Throwable => () }
      if (stdout) {
        // Compact contract line (VERDICT r6 #5): top-20 slowest, first 10
        // errors (n_failed has the true count), the stress block BY COUNT
        // — full per-query stress minimums and per-iteration arrays live
        // in BENCH_DETAIL.json / BENCH_HISTORY.jsonl.
        val slowest = results.toSeq.sortBy(-_._2).take(20)
        val stressRef =
          s""""stress":{"scale":$stressScale,"iters":$stressIters,"n_base":${stressBase.size},"n_scaled":${stressBig.size},"n_skipped":${skippedStress.size},"detail":"BENCH_DETAIL.json"}"""
        println(s"""{"phase":"$phase","metric":"total","value":${f"$total%.3f"},"unit":"sec","n_queries":${results.size},"n_iters":$nIters,"n_failed":${errors.size},"queries":${fmt(slowest)},"errors":${fmtErr(errors.take(10))},"n_warmup_errors":${warmupErrors.size},$stressRef,"online_rows_per_sec":${f"$onlineRps%.0f"},$calibJson,"elapsed_sec":${f"$elapsed%.1f"},"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
      }
    }

    // ---- phase 1: warmup ------------------------------------------------
    // Untimed, so it runs PARALLEL (4 submitter threads): tiny sf0.001
    // jobs badly underutilize 32 cores one at a time — the serial pass
    // cost 546 s of the budget on a slow box phase. Spark's scheduler
    // multiplexes concurrent job submissions; warmup only needs the JIT/
    // codegen/footer caches touched, not timing isolation.
    {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      def warm(name: String, thunk: () => org.apache.spark.sql.DataFrame)
          : Unit = {
        pool.submit(new Runnable {
          def run(): Unit =
            try thunk().write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              warmupErrors.synchronized {
                if (!warmupErrors.contains(name))
                  warmupErrors(name) = jsonSafe(
                    e.getClass.getSimpleName + ": " +
                      Option(e.getMessage).getOrElse(""))
              }
            }
        })
        ()
      }
      queries.foreach { case (name, fn) =>
        warm(name, () => fn(spark, warmDir))
      }
      // stress-row warmups ride the same pool (JIT/codegen caches persist
      // across phases, so the per-row serial warmup the stress phase used
      // to pay — ~2 s x 44 rows on a slow box — is covered here)
      if (stressScale0 > 1) stressSelected0.foreach { case (name, fn) =>
        warm(name, () => fn(spark, warmDir, 1))
      }
      pool.shutdown()
      // budget-scaled timeout, result CHECKED (ADVICE r8): a warmup still
      // running when the timed phase starts would contaminate every timed
      // measurement — cancel everything in flight and record it
      val warmCapSec = math.min(1800.0, budget * 0.33).toLong
      val done = pool.awaitTermination(
        warmCapSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) {
        notes += s"warmup_timeout after ${warmCapSec}s: cancelled in-flight warmup jobs"
        spark.sparkContext.cancelAllJobs()
        pool.shutdownNow()
        // give cancellation a moment so no warmup task overlaps iteration 1
        pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
        ()
      }
    }
    phaseSec("warmup") = elapsed
    emit("warmup", stdout = false)

    // ---- phase 2: timed main iterations ---------------------------------
    // min-per-query over iterations: steady-state time without GC/
    // scheduler/co-tenant noise (observed +/-40% between runs on this
    // box); cache cleared between so nothing rides a previous iteration's
    // persisted intermediates. Probe-gated (VERDICT r8 #1a): a fast box
    // runs up to 3 budget-adaptive iterations here; a slow box runs
    // exactly ONE — its extra iterations move behind the stress block so
    // the box-insensitive stress ratios are never the budget casualty.
    val iterations = scala.collection.mutable.ArrayBuffer[Map[String, Option[Double]]]()
    var lastIterSec = 0.0
    def runMainIteration(): Unit = {
      spark.catalog.clearCache()
      val it0 = elapsed
      iterations += queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { run(fn(spark, sfDir)); true }
          catch { case e: Throwable => recordError(name, e); false }
        name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }
      lastIterSec = elapsed - it0
      nIters = iterations.size
      results = queries.keys.flatMap { name =>
        val times = iterations.toSeq.flatMap(_(name))
        // only queries that succeeded every timed iteration count as timed
        if (times.size == iterations.size && !errors.contains(name))
          Some(name -> times.min)
        else None
      }.toMap
    }
    probe("pre_main")
    val maxItersUpFront = if (fastBox) 3 else 1
    var continueIters = true
    while (iterations.size < maxItersUpFront && continueIters) {
      runMainIteration()
      emit(s"main_iter_${iterations.size}", stdout = false)
      // 0.68 of budget for warmup+main: warmup pre-pays the stress rows'
      // JIT too (the stress phase no longer warms per row), so main can
      // take a bigger share — measured slow-box arithmetic: warmup 365 s
      // + 2 x 600 s iterations = 1565 s < 1836 s keeps min-of-2, leaving
      // ~1100 s for the single-pass stress block (~750 s with pre-paid
      // warmups); a fast box fits min-of-3 plus min-of-2 stress with
      // ~900 s of margin
      if (iterations.size < maxItersUpFront &&
          elapsed + lastIterSec * 1.15 > budget * 0.68) {
        notes += s"main iteration ${iterations.size + 1} deferred behind stress for budget at ${f"$elapsed%.0f"}s"
        println(s"""{"note":"main iteration ${iterations.size + 1} deferred behind stress for budget","elapsed_sec":${f"$elapsed%.1f"},"budget_sec":$budget}""")
        continueIters = false
      }
    }
    phaseSec("main") = elapsed - phaseSec("warmup")
    emit("main")

    // ---- phase 3: online (row-at-a-time) serving micro-bench -------------
    // The reference's online deploy mode scores one-row frames through its
    // exported graph (RunBench.py:41,66-77); the analog here is
    // OnlineScorer's compiled closure chain over frozen fitted state. Fit
    // the OnlineScorerSpec pipeline (9 stages: concat/map/label/freq/
    // target/hash/agg/scaler/one-hot) once at the bench SF, then measure
    // single-row scoring throughput driver-side — no Spark job per call.
    // Runs BEFORE stress (VERDICT r7 #1): round 7 ran it last, inside the
    // killed window, and the round lost its online number entirely.
    onlineRps =
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
    phaseSec("online") = elapsed - phaseSec("warmup") - phaseSec("main")
    emit("online")

    // ---- phase 4: scale-stress block (VERDICT r5 #2, r6 #2) --------------
    // Each StressBench query runs at x1 and at xSPARK_GRAFT_STRESS
    // (default 16; per-row overrides in StressBench.scaleOverride shrink
    // the heaviest rows — the RATIO is the artifact, not the absolute
    // seconds) so every round's bench artifact carries the measured ratio
    // vs linear scaling for the banded/binned/distributed paths.
    // Rows run ONE AT A TIME (x1 iters -> xscale iters; the JIT/codegen
    // warmup already happened in the parallel phase-1 pool), detail
    // re-emitted after every row, so a wall-clock kill loses at most the
    // row in flight. Rows skipped when past 90% of budget are REPORTED in
    // skipped_stress. SPARK_GRAFT_STRESS=0 disables. Stress failures fail
    // the run like timed ones.
    probe("pre_stress")
    if (stressScale > 1) {
      var sinceStdout = 0
      stressSelected0.foreach { case (name, fn) =>
        if (elapsed > budget * 0.90) {
          skippedStress += name
        } else {
          val rowScale = StressBench.scaleOverride.getOrElse(name, stressScale)
          def timeRow(reps: Int): Option[Seq[Double]] = {
            val times = (1 to stressIters).flatMap { _ =>
              spark.catalog.clearCache()
              val t0 = System.nanoTime()
              try { run(fn(spark, sfDir, reps))
                Some((System.nanoTime() - t0) / 1e9) }
              catch { case e: Throwable =>
                recordError(s"$name@x$reps", e); None }
            }
            // all iterations must succeed for the cell to count (a partial
            // min could mask an intermittent failure as a fast run)
            if (times.size == stressIters) Some(times) else None
          }
          timeRow(1).foreach(ts => stressBaseIters(name) = ts)
          timeRow(rowScale).foreach(ts => stressBigIters(name) = ts)
          sinceStdout += 1
          emit("stress", stdout = sinceStdout >= 8)
          if (sinceStdout >= 8) sinceStdout = 0
        }
      }
      if (skippedStress.nonEmpty)
        println(s"""{"note":"stress rows skipped for budget","skipped":${skippedStress.size},"elapsed_sec":${f"$elapsed%.1f"}}""")
    }
    phaseSec("stress") =
      elapsed - phaseSec("warmup") - phaseSec("main") - phaseSec("online")

    // ---- phase 5: leftover-budget main iterations ------------------------
    // The flip VERDICT r8 recommended: with the complete stress table
    // banked, any remaining budget buys back main-pass min-smoothing (the
    // slow-box path runs exactly one up-front iteration; a fast box that
    // deferred iteration 3 also lands here). Minima fold into the same
    // `results`/`n_iters` the contract line reports.
    val extra0 = elapsed
    val itersBeforeExtra = nIters
    while (nIters < 3 && lastIterSec > 0 &&
        elapsed + lastIterSec * 1.15 < budget * 0.95) {
      runMainIteration()
      notes += s"extra main iteration $nIters after stress at ${f"$elapsed%.0f"}s"
      emit(s"main_extra_$nIters", stdout = false)
    }
    if (nIters > itersBeforeExtra) phaseSec("main_extra") = elapsed - extra0

    probe("end")
    // legacy keys for pre-r9 tooling: calib_sec.start / calib_sec.end are
    // the first/last scalar probes (normalize_bench.py reads named points
    // and the parallel map directly now, but BENCH_HISTORY consumers may
    // not)
    emit("final", history = true)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
