package graft

import graft.relational.Eval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-evaluation and monitoring queries over [[graft.relational.Eval]]:
  * exact AUC (small + binned scale path twins against ONE oracle), score
  * calibration, cumulative lift/gains, a threshold confusion sweep,
  * Kaplan-Meier survival over the event log, and per-series CUSUM
  * changepoints. The classifier score for the orders-table queries is a
  * deterministic pseudo-score `(o_orderkey % 1000) / 1000.0` — both
  * engines derive it from the same integers with the same IEEE ops, so
  * the oracle replays it bit-exactly (the same discipline as the decay
  * weights). All oracle SQL is generated from the SAME Scala constants
  * the Spark queries run with. */
object EvalQueries {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val CalBins = 10
  private val LiftBuckets = 10
  private val ConfThresholds = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
  private val CusumTarget = 100.0
  private val CusumSlack = 0.0
  private val CusumH = 50.0

  /** Per-customer revenue in integer cents (exact, order-independent
    * sums — see q_gini). */
  private def custRevenueCents(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("vc"))

  /** Pseudo-score + binary label over orders, shared by the calibration /
    * lift / confusion queries (Spark side). */
  private def scoredOrders(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("score",
        (col("o_orderkey") % 1000).cast("double") / lit(1000.0))
      .withColumn("label",
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact AUC with midrank ties on a HEAVILY tied score (11 distinct
    // discount values): the small ordered-cumulative path
    "q_auc" -> ((s, d) =>
      Eval.auc(t(s, d, "lineitem")
        .withColumn("label",
          when(col("l_returnflag") === "R", 1L).otherwise(0L)),
        "l_discount", "label")),

    // continuous-score AUC, small path (distinct ≤ default threshold at
    // the gate SF)…
    "q_auc_cont" -> ((s, d) =>
      Eval.auc(t(s, d, "orders")
        .withColumn("label",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)),
        "o_totalprice", "label")),

    // …and its 100-TB twin: the SAME query forced down the binned path
    // (256 approx-quantile bins, per-bin windows) against the SAME
    // oracle SQL — the scale path faces the oracle, not just unit tests
    "q_auc_binned" -> ((s, d) =>
      Eval.auc(t(s, d, "orders")
        .withColumn("label",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)),
        "o_totalprice", "label", maxDistinctBroadcast = 100)),

    // PR-AUC with threshold-grouped ties on the heavily tied discount
    "q_prauc" -> ((s, d) =>
      Eval.prAuc(t(s, d, "lineitem")
        .withColumn("label",
          when(col("l_returnflag") === "R", 1L).otherwise(0L)),
        "l_discount", "label")),

    // continuous-score PR-AUC, small path…
    "q_prauc_cont" -> ((s, d) =>
      Eval.prAuc(t(s, d, "orders")
        .withColumn("label",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)),
        "o_totalprice", "label")),

    // …and the forced binned twin against the SAME oracle
    "q_prauc_binned" -> ((s, d) =>
      Eval.prAuc(t(s, d, "orders")
        .withColumn("label",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)),
        "o_totalprice", "label", maxDistinctBroadcast = 100)),

    // reliability table: 10 score bins, mean score vs positive rate
    "q_calibration" -> ((s, d) =>
      Eval.calibration(scoredOrders(s, d), "score", "label", CalBins)),

    // the scalar calibration summary over the same bins
    "q_ece" -> ((s, d) =>
      Eval.ece(scoredOrders(s, d), "score", "label", CalBins)),

    // isotonic (PAV) calibration over the same bins via the closed
    // minimax form — monotone non-decreasing calibrated rates
    "q_isotonic" -> ((s, d) =>
      Eval.isotonicCalibration(scoredOrders(s, d), "score", "label",
        CalBins)),

    // the serving half: every order's score remapped through the
    // fitted curve (broadcast ≤ nBins rows — stream-safe)
    "q_isotonic_score" -> ((s, d) => {
      val base = scoredOrders(s, d)
      val fit = Eval.isotonicCalibration(base, "score", "label", CalBins)
      Eval.isotonicScore(base, "score", fit, CalBins)
        .select(col("o_orderkey"), col("calibrated"))
    }),

    // cumulative gains + lift by descending-score decile
    "q_lift" -> ((s, d) =>
      Eval.liftGains(scoredOrders(s, d), "score", "label", LiftBuckets)),

    // confusion matrix + precision/recall/F1 at 5 thresholds, one pass
    "q_confusion" -> ((s, d) =>
      Eval.confusionSweep(scoredOrders(s, d), "score", "label",
        ConfThresholds)),

    // Kaplan-Meier: per-user observation span in hours, event = the user
    // ever purchased (others censored at last sighting)
    "q_survival" -> ((s, d) => {
      val e = DataQueries.readEventsMicros(s, d)
        .withColumn("hour", expr("tsu div 3600000000"))
      val subjects = e.groupBy("user_id")
        .agg((max("hour") - min("hour")).as("duration"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("ev"))
      Eval.kaplanMeier(subjects, "duration", "ev")
    }),

    // segmented survival: heavy (≥10 events) vs light users, per-segment
    // curves from ONE pass — windows partition by segment
    "q_survival_grouped" -> ((s, d) => {
      val e = DataQueries.readEventsMicros(s, d)
        .withColumn("hour", expr("tsu div 3600000000"))
      val subjects = e.groupBy("user_id")
        .agg((max("hour") - min("hour")).as("duration"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("ev"),
          when(count(lit(1)) >= 10, lit("heavy")).otherwise(lit("light"))
            .as("seg"))
      Eval.kaplanMeier(subjects, "duration", "ev", Seq("seg"))
    }),

    // Benford first-digit screen on order totals
    "q_benford" -> ((s, d) =>
      Eval.benford(t(s, d, "orders"), "o_totalprice")),

    // Zipf fit: log-log slope of the top-500 token frequency curve —
    // natural corpora sit near -1, synthetic/templated text drifts
    "q_zipf" -> ((s, d) =>
      graft.text.Corpus.buildVocab(t(s, d, "documents"), "text", 500)
        .agg(
          round(expr("regr_slope(ln(n_occurrences), ln(token_id + 1))"),
            6).as("slope"),
          round(expr(
            "regr_intercept(ln(n_occurrences), ln(token_id + 1))"), 6)
            .as("intercept"),
          round(expr("regr_r2(ln(n_occurrences), ln(token_id + 1))"), 6)
            .as("r2"),
          count(lit(1)).as("n"))),

    // CUSUM drift alarm over each event type's daily volume
    "q_cusum" -> ((s, d) => {
      val daily = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"))
      Eval.cusum(daily, Seq("event_type"), "day", "cnt",
        target = CusumTarget, slack = CusumSlack, h = CusumH)
    }),

    // weekly memory in the event stream: per-type autocorrelation of
    // daily volumes at lags 1..7 — ONE window pass + ONE aggregate,
    // integral counts so both engines sum exactly
    "q_acf" -> ((s, d) => {
      val daily = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"))
      Eval.acf(daily, Seq("event_type"), "day", "cnt", AcfMaxLag)
    }),

    // do line statuses move different quantities AT ALL: one-way
    // ANOVA F across line statuses — one moment aggregate, k-row finish
    "q_anova" -> ((s, d) =>
      Eval.anovaF(t(s, d, "lineitem"), "l_linestatus", "l_quantity")),

    // do the SPREADS differ: Brown-Forsythe (median-centered Levene)
    // on quantity across return flags — exact nearest-rank medians
    "q_brown_forsythe" -> ((s, d) =>
      Eval.brownForsythe(t(s, d, "lineitem"), "l_returnflag",
        "l_quantity")),

    // which nations' urgent-order rates REALLY deviate: per-nation
    // proportion z vs the rest → portable normal p (A&S erf) →
    // Benjamini-Hochberg step-up across the 25 tests
    "q_fdr" -> ((s, d) => {
      val subj = t(s, d, "orders")
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .withColumn("succ",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
      Eval.fdrAdjust(
        Eval.proportionsByGroup(subj, Seq("c_nationkey"), "succ"),
        Seq("c_nationkey"), "p", alpha = 0.05)
    }),

    // which activity LEADS purchases and by how many days: per-type
    // cross-correlation of daily volumes against the purchase series at
    // lags -3..3 — one window sort, one aggregate, explode after
    "q_ccf" -> ((s, d) => {
      val daily = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"))
      val purch = daily.filter(col("event_type") === "purchase")
        .select(col("day").as("pday"), col("cnt").as("pcnt"))
      val joined = daily.filter(col("event_type") =!= "purchase")
        .join(purch, col("day") === col("pday"))
      Eval.ccf(joined, Seq("event_type"), "day", "cnt", "pcnt",
        CcfMaxLag)
    }),

    // is the targeting model finding incremental responders: Qini
    // curve by score decile over a deterministic pseudo-treatment
    "q_uplift" -> ((s, d) =>
      Eval.upliftDeciles(t(s, d, "orders")
        .withColumn("score",
          (col("o_orderkey") % 1000).cast("double") / lit(1000.0))
        .withColumn("treat", (col("o_orderkey") % 2).cast("long"))
        .withColumn("y",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)),
        "score", "treat", "y")),

    // is model B actually different from model A on the SAME orders:
    // McNemar over the discordant pairs of two deterministic
    // pseudo-classifiers
    "q_mcnemar" -> ((s, d) =>
      Eval.mcNemar(t(s, d, "orders")
        .withColumn("y",
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
        .withColumn("pa",
          ((col("o_orderkey") % 1000).cast("double") / lit(1000.0) >
            0.5).cast("long"))
        .withColumn("pb",
          ((col("o_orderkey") % 777).cast("double") / lit(777.0) >
            0.5).cast("long")),
        "y", "pa", "pb")),

    // are the R and N slices comparable before reading anything into
    // their deltas: standardized mean differences for four numeric
    // features in ONE melted pass
    "q_balance" -> ((s, d) =>
      graft.relational.Analytics.balanceSweep(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        "l_returnflag", "R", "N")),

    // what's suddenly hot: week-over-week volume rank movers per event
    // type — dense within-week ranks, previous-appearance deltas
    "q_rank_movers" -> ((s, d) =>
      graft.relational.Analytics.rankMovers(
        DataQueries.readEventsMicros(s, d)
          .withColumn("week", expr("tsu div 604800000000"))
          .withColumn("one", lit(1L)),
        Seq("event_type"), "week", "one")),

    // are daily volumes drifting: distribution-free Mann-Kendall trend
    // per event type (calendar-bounded pairwise, tie-corrected)
    "q_mann_kendall" -> ((s, d) => {
      val daily = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"))
      Eval.mannKendall(daily, Seq("event_type"), "day", "cnt")
    }),

    // does urgency RISE with customer balance: Cochran-Armitage trend
    // across ordinal balance bands — the test that rewards ordering
    "q_trend" -> ((s, d) =>
      Eval.trendTest(
        t(s, d, "orders")
          .join(t(s, d, "customer").select("c_custkey", "c_acctbal"),
            col("o_custkey") === col("c_custkey"))
          .withColumn("band", floor(col("c_acctbal") / 2000).cast("long"))
          .withColumn("y",
            when(col("o_orderpriority") === "1-URGENT", 1L)
              .otherwise(0L)),
        "band", "y")),

    // document length distribution per source: exact p25..p99 character
    // counts off one per-source sort (percentileBands reused)
    "q_length_bands" -> ((s, d) =>
      graft.relational.Analytics.percentileBands(
        t(s, d, "documents"), Seq("source"), "n_chars")),

    // Simpson's-paradox guard: BUILDING vs MACHINERY urgent rates,
    // crude AND standardized to the pooled nation mix
    "q_simpson" -> ((s, d) =>
      graft.relational.Analytics.standardizedRates(
        t(s, d, "orders")
          .join(t(s, d, "customer")
            .select("c_custkey", "c_nationkey", "c_mktsegment"),
            col("o_custkey") === col("c_custkey"))
          .withColumn("y",
            when(col("o_orderpriority") === "1-URGENT", 1L)
              .otherwise(0L)),
        "c_nationkey", "c_mktsegment", "y", "BUILDING", "MACHINERY")),

    // robust anomaly flags: |x − median| > 3·MAD per return flag, both
    // statistics exact nearest-rank order stats
    "q_mad_outliers" -> ((s, d) =>
      graft.relational.Analytics.madOutliers(t(s, d, "lineitem"),
        Seq("l_returnflag"), "l_extendedprice", k = 3.0)),

    // privacy gate: k-anonymity of customers on (nation, segment,
    // rounded balance) quasi-identifiers — one QI count + a fold
    "q_k_anonymity" -> ((s, d) =>
      graft.relational.Analytics.kAnonymity(
        t(s, d, "customer").withColumn("bal_band",
          floor(col("c_acctbal") / 1000).cast("long")),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)),

    // …and its companion: big groups can still leak if the sensitive
    // value is homogeneous — l-diversity over balance bands
    "q_l_diversity" -> ((s, d) =>
      graft.relational.Analytics.lDiversity(
        t(s, d, "customer").withColumn("bal_band",
          floor(col("c_acctbal") / 1000).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 2)),

    // is each daily series trustworthy: span vs observed periods and
    // the longest missing run, per event type
    "q_series_completeness" -> ((s, d) =>
      graft.relational.Analytics.seriesCompleteness(
        DataQueries.readEventsMicros(s, d)
          .withColumn("day", expr("tsu div 86400000000")),
        Seq("event_type"), "day")),

    // how much of the corpus is copies: the duplicate-cluster size
    // histogram with row shares
    "q_dup_size_profile" -> ((s, d) =>
      graft.text.Dedup.duplicateSizeProfile(t(s, d, "documents"),
        Seq("text"))),

    // the marketing classic, exact at scale: RFM quintile segments per
    // customer with boundaries from distributed exact order statistics
    "q_rfm" -> ((s, d) =>
      graft.relational.Analytics.rfmSegments(
        t(s, d, "orders")
          .withColumn("od", unix_date(to_date(col("o_orderdate")))),
        "o_custkey", "od", "o_totalprice")),

    // point-in-time-correct churn training labels: features from
    // events up to max(t) − 7d, the 0/1 label from the final week —
    // keys first seen inside the label window are excluded (leakage)
    "q_churn_labels" -> ((s, d) =>
      graft.relational.Analytics.churnLabels(
        DataQueries.readEventsMicros(s, d), Seq("user_id"), "tsu",
        horizon = 604800000000L)),

    // do purchasers also search: exact audience Jaccard/containment
    // between every pair of event types — id-keyed join, fan-out
    // bounded by the type count
    "q_audience_overlap" -> ((s, d) =>
      graft.relational.Analytics.audienceOverlap(
        DataQueries.readEventsMicros(s, d), "event_type", "user_id")),

    // engagement/churn readback: per-user inter-event gap profile with
    // exact nearest-rank percentiles and the most recent gap
    "q_inter_arrival" -> ((s, d) =>
      graft.relational.Analytics.interArrival(
        DataQueries.readEventsMicros(s, d), Seq("user_id"), "tsu")),

    // how many equal-weight rows is the revenue-weighted order sample
    // worth: Kish effective sample size over budget-unit weights
    "q_ess" -> ((s, d) =>
      graft.relational.Analytics.effectiveSampleSize(
        t(s, d, "orders").select(
          floor(col("o_totalprice") / 100).cast("long").as("wt")),
        "wt")),

    // cross-slice distribution alignment: the exact quantile map that
    // makes the N slice's prices rank-comparable to the R slice's —
    // rank-space bin join, never a nested loop; small path…
    "q_quantile_norm" -> ((s, d) =>
      Eval.quantileNormalize(t(s, d, "lineitem"), "l_extendedprice",
        "l_returnflag", target = "N", ref = "R")),

    // …and the forced-binned cumulative twin against the SAME oracle
    "q_quantile_norm_binned" -> ((s, d) =>
      Eval.quantileNormalize(t(s, d, "lineitem"), "l_extendedprice",
        "l_returnflag", target = "N", ref = "R",
        maxDistinctBroadcast = 100)),

    // exact raw-value two-sample KS (the register KS's exact sibling):
    // does returned merchandise price differently — small path…
    "q_ks_exact" -> ((s, d) =>
      Eval.ksExact(t(s, d, "lineitem"), "l_extendedprice",
        "l_returnflag", "R", "N")),

    // …and the binned 100-TB twin (distinct prices ≈ rows) against the
    // SAME oracle
    "q_ks_exact_binned" -> ((s, d) =>
      Eval.ksExact(t(s, d, "lineitem"), "l_extendedprice",
        "l_returnflag", "R", "N", maxDistinctBroadcast = 100)),

    // is the weekly pattern real: seasonal-naive vs naive-1 backtest
    // over daily volumes — positive skill means lag-7 structure exists
    "q_forecast_backtest" -> ((s, d) => {
      val daily = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"))
      Eval.forecastBacktest(daily, Seq("event_type"), "day", "cnt",
        season = 7)
    }),

    // robust center next to the plain one: 10%-trimmed mean quantity
    // per return flag — exact rank trimming, one window pass
    "q_trimmed_mean" -> ((s, d) =>
      graft.relational.Analytics.trimmedMean(t(s, d, "lineitem"),
        Seq("l_returnflag"), "l_quantity", trim = 0.1)),

    // the median price BY QUANTITY MASS (not by line count): exact
    // weighted percentiles per return flag
    "q_weighted_percentiles" -> ((s, d) =>
      graft.relational.Analytics.weightedPercentiles(
        t(s, d, "lineitem"), Seq("l_returnflag"), "l_extendedprice",
        "l_quantity")),

    // the latency-dashboard shape: EXACT p25/p50/p75/p90/p99 price per
    // return flag from ONE per-group sort — nearest-rank order
    // statistics, never percentile_approx
    "q_percentile_bands" -> ((s, d) =>
      graft.relational.Analytics.percentileBands(t(s, d, "lineitem"),
        Seq("l_returnflag"), "l_extendedprice")),

    // how sure are we about average customer revenue: percentile
    // bootstrap CI via the deterministic one-pass Poisson(1) resample —
    // md5-replayed weights, 32 replicate means from ONE scan, no RNG
    "q_bootstrap" -> ((s, d) =>
      Eval.bootstrapMeanCI(custRevenueCents(s, d), "vc", "o_custkey",
        replicates = BootReps, alpha = BootAlpha)),

    // WHERE did the regime change: best single mean-shift split per
    // event type over daily volumes — every candidate cut scored from
    // ONE cumulative pass, argmin by a second in-partition sort
    "q_changepoint" -> ((s, d) => {
      val daily = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"))
      Eval.changepoint(daily, Seq("event_type"), "day", "cnt")
    }),

    // conversion-rate A/B: do heavy users purchase more often — pooled
    // two-proportion z over the per-user success indicator
    "q_ab_proportions" -> ((s, d) => {
      val subjects = DataQueries.readEventsMicros(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"),
          when(count(lit(1)) >= 10, lit("heavy")).otherwise(lit("light"))
            .as("seg"))
      Eval.twoProportionZ(subjects, "converted", "seg", "heavy", "light")
    }),

    // per-channel high-value rate with Wilson 95% intervals — the
    // dashboard rate tile that stays sane for tiny channels
    "q_rate_ci" -> ((s, d) =>
      Eval.wilsonRates(DataQueries.readEventsMicros(s, d)
        .withColumn("big", when(col("value") >= 50.0, 1L).otherwise(0L)),
        Seq("event_type"), "big")),

    // weekly shape of each event type's daily volume: dow index vs the
    // channel's own mean (integral counts — the index replays exactly)
    "q_seasonality" -> ((s, d) => {
      val daily = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"))
      graft.relational.Analytics.seasonality(daily, Seq("event_type"),
        "day", "cnt")
    }),

    // monotone association: Spearman rho with exact midrank ties —
    // quantity vs line price (near-1 by construction)
    "q_spearman" -> ((s, d) =>
      Eval.spearman(t(s, d, "lineitem"), "l_quantity",
        "l_extendedprice")),

    // search/recommendation readback: NDCG@10 / MRR@10 / MAP@10 over
    // per-customer order lists ranked by the deterministic pseudo-score
    // against graded priority relevance (2=urgent, 1=high). Per-item
    // contributions are 2^-20 integers off Scala-tabulated discount
    // constants, so both engines sum exactly in any order
    "q_ranking" -> ((s, d) =>
      Eval.rankingMetrics(rankedOrders(s, d), "o_custkey", "o_orderkey",
        "score", "rel", RankK)),

    // …and the per-query relation the summary averages (null metrics
    // for customers with no relevant orders)
    "q_ranking_per_query" -> ((s, d) =>
      Eval.rankingPerQuery(rankedOrders(s, d), "o_custkey", "o_orderkey",
        "score", "rel", RankK)),

    // A/B readback, parametric: did urgent orders move total price vs
    // low-priority — Welch's t with Satterthwaite df, one moment pass
    "q_ab_ttest" -> ((s, d) =>
      Eval.welchTTest(t(s, d, "orders"), "o_totalprice",
        "o_orderpriority", "1-URGENT", "5-LOW")),

    // A/B readback, distribution-free: Mann-Whitney rank-sum z with the
    // standard tie correction on the heavily tied discount column
    "q_ab_ranksum" -> ((s, d) =>
      Eval.rankSumTest(t(s, d, "lineitem")
        .withColumn("label",
          when(col("l_returnflag") === "R", 1L).otherwise(0L)),
        "l_discount", "label")),

    // revenue concentration across customers: exact Lorenz/Gini over
    // per-customer revenue in integer CENTS (floor quantization — the
    // TPC-H money discipline: double sums would group differently per
    // engine, cent sums are order-independent exact integers)
    "q_gini" -> ((s, d) =>
      Eval.lorenzGini(custRevenueCents(s, d), "vc")),

    // …and the forced binned twin (distinct revenues ≈ customers)
    // against the SAME oracle
    "q_gini_binned" -> ((s, d) =>
      Eval.lorenzGini(custRevenueCents(s, d), "vc",
        maxDistinctBroadcast = 100)),

    // feature triage: cardinality/entropy/top-share for every listed
    // column in ONE melted pass
    "q_feature_audit" -> ((s, d) =>
      graft.relational.Analytics.featureAudit(t(s, d, "orders"),
        AuditFeatures)),

    // drift sweep: categorical PSI for every listed feature, 1996 ref
    // vs 1997 current, one melted pass per snapshot
    "q_psi_sweep" -> ((s, d) => {
      val o = t(s, d, "orders")
      def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
      graft.relational.Analytics.psiSweep(yr(1996), yr(1997),
        AuditFeatures)
    }),

    // split-conformal interval for a crude price model (1000/unit):
    // finite-sample residual quantile on even order keys, realized
    // coverage on odd — the distribution-free guarantee, read back
    "q_conformal" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .withColumn("pred", col("l_quantity") * 1000.0)
      Eval.conformal(
        li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 =!= 0),
        "pred", "l_extendedprice", ConformalAlpha)
    }),

    // inter-annotator agreement: priority vs a deterministically
    // degraded second annotation (refuses ~2/7 of rows as 3-MEDIUM)
    "q_kappa" -> ((s, d) =>
      Eval.cohenKappa(t(s, d, "orders")
        .withColumn("anno_b",
          when(col("o_orderkey") % 7 < 5, col("o_orderpriority"))
            .otherwise(lit("3-MEDIUM"))),
        "o_orderpriority", "anno_b")),

    // multi-class per-class precision/recall/F1 for the same degraded
    // annotation (3-MEDIUM inflated by the refusals)
    "q_multiclass" -> ((s, d) =>
      Eval.multiclassMetrics(t(s, d, "orders")
        .withColumn("anno_b",
          when(col("o_orderkey") % 7 < 5, col("o_orderpriority"))
            .otherwise(lit("3-MEDIUM"))),
        "o_orderpriority", "anno_b")),

    // fairness readback: confusion + tpr/fpr/precision/base_rate per
    // order status AND the rollup total row, one pass
    "q_fairness" -> ((s, d) =>
      Eval.groupConfusion(scoredOrders(s, d), "score", "label",
        Seq("o_orderstatus"), threshold = FairnessThreshold)),

    // proper scoring rules over the pseudo-probability
    "q_brier" -> ((s, d) =>
      Eval.scoringRules(scoredOrders(s, d), "score", "label",
        eps = ScoreEps)))

  private val FairnessThreshold = 0.5
  private val ScoreEps = 1e-6
  private val ConformalAlpha = 0.1
  private val AuditFeatures =
    Seq("o_orderpriority", "o_orderstatus", "o_custkey")

  /** Lorenz/Gini oracle: the trapezoid integral over distinct cent
    * values — the same strictly-below cumulative CTE shape as aucSql. */
  private val GiniSql =
    """WITH rev AS (
         SELECT o_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS vc
         FROM orders GROUP BY 1),
       c AS (
         SELECT CAST(vc AS DOUBLE) AS s, count(*) AS c,
           sum(CAST(vc AS DOUBLE)) AS m
         FROM rev WHERE vc >= 0 GROUP BY 1),
       r AS (
         SELECT s, c, m,
           CAST(coalesce(sum(c) OVER wb, 0) AS BIGINT) AS cb,
           coalesce(sum(m) OVER wb, 0.0) AS mb
         FROM c
         WINDOW wb AS (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       t AS (SELECT CAST(sum(c) AS BIGINT) AS n_all, sum(m) AS m_all
         FROM c)
       SELECT
         round(1.0 - sum(
           (CAST(cb + c AS DOUBLE) / n_all - CAST(cb AS DOUBLE) / n_all)
           * ((mb + m) / m_all + mb / m_all)), 6) AS gini,
         CAST(sum(c) AS BIGINT) AS n,
         round(sum(m), 6) AS total
       FROM r, t GROUP BY n_all, m_all"""

  /** Per-feature audit oracle generated from the SAME feature list the
    * Spark query melts — the miRankingSql pattern. */
  private def featureAuditSql(table: String,
      features: Seq[String]): String =
    features.map { f =>
      s"""SELECT '$f' AS feature, CAST(max(n) AS BIGINT) AS n,
           CAST(max(d) AS BIGINT) AS n_distinct,
           round(sum(-(c / CAST(n AS DOUBLE))
             * ln(c / CAST(n AS DOUBLE))), 6) AS entropy,
           round(CAST(max(topc) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
             AS top_share
         FROM (
           WITH c AS (SELECT CAST($f AS VARCHAR) AS v, count(*) AS c
               FROM $table WHERE $f IS NOT NULL GROUP BY 1),
           t AS (SELECT sum(c) AS n, count(*) AS d, max(c) AS topc
               FROM c)
           SELECT c.c, t.n, t.d, t.topc FROM c CROSS JOIN t)"""
    }.mkString("\nUNION ALL\n")

  /** PSI-sweep oracle: q_psi_cat's smoothing arithmetic per feature,
    * UNION ALL over the same list. */
  private def psiSweepSql(table: String, features: Seq[String],
      refYear: Int, curYear: Int): String =
    features.map { f =>
      s"""SELECT '$f' AS feature, CAST(max(nr) AS BIGINT) AS n_ref,
           CAST(max(nc) AS BIGINT) AS n_cur,
           CAST(max(nb) AS BIGINT) AS n_categories,
           round(sum(
             ((cr + 0.5) / (nr + 0.5 * nb) -
              (cc + 0.5) / (nc + 0.5 * nb)) *
             ln(((cr + 0.5) / (nr + 0.5 * nb)) /
                ((cc + 0.5) / (nc + 0.5 * nb)))), 6) AS psi
         FROM (
           WITH refc AS (SELECT CAST($f AS VARCHAR) AS v, count(*) AS cr
               FROM $table WHERE strftime(o_orderdate, '%Y') = '$refYear'
                 AND $f IS NOT NULL GROUP BY 1),
           curc AS (SELECT CAST($f AS VARCHAR) AS v, count(*) AS cc
               FROM $table WHERE strftime(o_orderdate, '%Y') = '$curYear'
                 AND $f IS NOT NULL GROUP BY 1),
           j AS (SELECT coalesce(cr, 0) AS cr, coalesce(cc, 0) AS cc
                 FROM refc FULL JOIN curc ON refc.v = curc.v),
           t AS (SELECT sum(cr) AS nr, sum(cc) AS nc, count(*) AS nb
                 FROM j)
           SELECT j.cr, j.cc, t.nr, t.nc, t.nb FROM j CROSS JOIN t)"""
    }.mkString("\nUNION ALL\n")

  /** Mann-Whitney AUC oracle over distinct score values — one SQL shape
    * shared by every AUC query (and by BOTH Spark paths of the binned
    * twin: binning is a physical choice, the oracle is the math). */
  private def aucSql(table: String, scoreExpr: String,
      labelCond: String): String =
    s"""WITH c AS (
         SELECT $scoreExpr AS s,
           CAST(sum(CASE WHEN $labelCond THEN 1 ELSE 0 END) AS BIGINT)
             AS p,
           CAST(sum(CASE WHEN $labelCond THEN 0 ELSE 1 END) AS BIGINT)
             AS q
         FROM $table WHERE $scoreExpr IS NOT NULL GROUP BY 1),
       r AS (
         SELECT p, q,
           CAST(coalesce(sum(q) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS nb
         FROM c),
       u AS (
         SELECT sum(p * (nb + q / 2.0)) AS u,
           CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(q) AS BIGINT) AS n_neg
         FROM r)
       SELECT round(u / (n_pos * CAST(n_neg AS DOUBLE)), 6) AS auc,
         n_pos, n_neg
       FROM u"""

  /** Average-precision oracle: same distinct-score cumulative CTEs as
    * [[aucSql]], finished with the threshold-sweep step integral. */
  private def prAucSql(table: String, scoreExpr: String,
      labelCond: String): String =
    s"""WITH c AS (
         SELECT $scoreExpr AS s,
           CAST(sum(CASE WHEN $labelCond THEN 1 ELSE 0 END) AS BIGINT)
             AS p,
           CAST(sum(CASE WHEN $labelCond THEN 0 ELSE 1 END) AS BIGINT)
             AS q
         FROM $table WHERE $scoreExpr IS NOT NULL GROUP BY 1),
       r AS (
         SELECT p, q,
           CAST(coalesce(sum(p) OVER wb, 0) AS BIGINT) AS pb,
           CAST(coalesce(sum(q) OVER wb, 0) AS BIGINT) AS qb
         FROM c
         WINDOW wb AS (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       t AS (
         SELECT CAST(sum(p) AS BIGINT) AS tp_all,
           CAST(sum(q) AS BIGINT) AS tq_all
         FROM c)
       SELECT
         round(sum(p * (CAST(tp_all - pb AS DOUBLE)
             / (tp_all + tq_all - pb - qb)))
           / CAST(tp_all AS DOUBLE), 6) AS pr_auc,
         tp_all AS n_pos, tq_all AS n_neg
       FROM r, t GROUP BY tp_all, tq_all"""

  private val ScoreSql = "(o_orderkey % 1000) / 1000.0"
  private val LabelSql = "o_orderpriority = '1-URGENT'"

  /** Shared CTE chain replaying [[Eval.isotonicCalibration]]'s closed
    * minimax form (b = bins, c = prefix sums, seg = segment rates,
    * iso = max-min fit) — used by q_isotonic and q_isotonic_score. */
  private lazy val IsotonicFitCtes =
    s"""b AS (
         SELECT least(CAST(floor(($ScoreSql) * $CalBins) AS BIGINT),
             ${CalBins - 1}) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN $LabelSql THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos
         FROM orders GROUP BY 1),
       c AS (
         SELECT bin, n, n_pos,
           CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS cn,
           CAST(sum(n_pos) OVER (ORDER BY bin
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
         FROM b),
       seg AS (
         SELECT i.bin AS bi, j.bin AS bj,
           CAST(j.cp - (i.cp - i.n_pos) AS DOUBLE) /
             CAST(j.cn - (i.cn - i.n) AS DOUBLE) AS a
         FROM c i JOIN c j ON i.bin <= j.bin),
       mm AS (
         SELECT k.bin AS bin, seg.bi, min(seg.a) AS mn
         FROM seg JOIN b k ON seg.bi <= k.bin AND seg.bj >= k.bin
         GROUP BY 1, 2),
       iso AS (SELECT bin, max(mn) AS iso FROM mm GROUP BY 1)"""

  // ---- Poisson bootstrap ----------------------------------------------------

  private val BootReps = 32
  private val BootAlpha = 0.05

  /** Bootstrap oracle: the identical md5-derived Poisson weights (same
    * [[Eval.PoissonT]] thresholds on the 60-bit scale), replicate means
    * ranked with the replicate index as tie-break, and the std-dev from
    * rank-ordered cumulative sums — every double on both sides is the
    * same IEEE expression over the same exact integers. */
  private def bootstrapSql: String = {
    val loIdx = math.max(1, math.ceil(BootAlpha / 2 * BootReps).toInt)
    val hiIdx = BootReps + 1 - loIdx
    val wtCase = Eval.PoissonT
      .map(t => s"(CASE WHEN v >= $t THEN 1 ELSE 0 END)")
      .mkString("\n             + ")
    s"""WITH base AS (
         SELECT CAST(o_custkey AS VARCHAR) AS id,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS x
         FROM orders GROUP BY o_custkey),
       t AS (
         SELECT CAST(sum(x) AS DOUBLE) / count(*) AS mean,
           count(*) AS n
         FROM base),
       rep AS (SELECT r FROM range($BootReps) tt(r)),
       h AS (
         SELECT x, r,
           CAST(('0x' || substr(md5(id || ':' || CAST(r AS VARCHAR)),
             1, 15)) AS BIGINT) AS v
         FROM base CROSS JOIN rep),
       w AS (
         SELECT x, r,
           $wtCase AS wt
         FROM h),
       m AS (
         SELECT r,
           CAST(sum(wt * x) AS DOUBLE) / CAST(sum(wt) AS DOUBLE) AS mm
         FROM w GROUP BY r HAVING sum(wt) > 0),
       rk AS (
         SELECT mm, r,
           row_number() OVER (ORDER BY mm, r) AS rk,
           sum(mm) OVER (ORDER BY mm, r ROWS UNBOUNDED PRECEDING) AS c1,
           sum(mm * mm) OVER (ORDER BY mm, r ROWS UNBOUNDED PRECEDING)
             AS c2
         FROM m)
       SELECT t.mean AS mean,
         min(CASE WHEN rk.rk = $loIdx THEN mm END) AS ci_lo,
         min(CASE WHEN rk.rk = $hiIdx THEN mm END) AS ci_hi,
         CASE WHEN t.mean <> 0.0 THEN
           round(sqrt(greatest(0.0,
             (max_by(c2, rk.rk)
               - max_by(c1, rk.rk) * max_by(c1, rk.rk)
                 / CAST(count(*) AS DOUBLE))
             / (CAST(count(*) AS DOUBLE) - 1))) / abs(t.mean), 6)
         END AS se_rel,
         t.n AS n, count(*) AS replicates
       FROM rk, t GROUP BY t.mean, t.n"""
  }

  /** FDR-screen oracle: identical pooled-z, A&S erf p-value (constants
    * interpolated from [[Eval.ErfP]]/[[Eval.ErfA]]/[[Eval.Sqrt2]] — the
    * SAME doubles the Spark expression uses), and BH step-up over the
    * rounded p relation. */
  private def fdrSql: String = {
    val a = Eval.ErfA
    s"""WITH b AS (
         SELECT c_nationkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS s
         FROM orders JOIN customer ON o_custkey = c_custkey),
       g AS (
         SELECT c_nationkey, CAST(sum(s) AS BIGINT) AS x, count(*) AS n
         FROM b GROUP BY 1),
       t AS (
         SELECT CAST(sum(x) AS BIGINT) AS tx,
           CAST(sum(n) AS BIGINT) AS tn
         FROM g),
       z AS (
         SELECT c_nationkey, x, n,
           CAST(x AS DOUBLE) / n AS p1,
           (CAST(x AS DOUBLE) / n
             - CAST(tx - x AS DOUBLE) / CAST(tn - n AS DOUBLE)) AS dv,
           sqrt((CAST(tx AS DOUBLE) / tn)
             * (1.0 - CAST(tx AS DOUBLE) / tn)
             * (1.0 / n + 1.0 / CAST(tn - n AS DOUBLE))) AS se
         FROM g, t WHERE tn > n),
       zz AS (SELECT *, dv / se AS zv FROM z),
       ph AS (SELECT *, abs(zv) / ${Eval.Sqrt2} AS xv FROM zz),
       ph2 AS (SELECT *, 1.0 / (1.0 + ${Eval.ErfP} * xv) AS tv FROM ph),
       pv AS (
         SELECT c_nationkey, x, n, p1, zv, se,
           2.0 * (1.0 - 0.5 * (1.0
             + (1.0 - tv * (${a(0)} + tv * (${a(1)} + tv * (${a(2)}
               + tv * (${a(3)} + tv * ${a(4)}))))
               * exp(-(xv * xv))))) AS praw
         FROM ph2),
       f AS (
         SELECT c_nationkey, x, n, round(p1, 6) AS rate,
           CASE WHEN se > 0 THEN round(zv, 6) END AS z,
           CASE WHEN se > 0 THEN round(praw, 6) END AS p
         FROM pv),
       r AS (
         SELECT *, row_number() OVER
             (ORDER BY p ASC, c_nationkey ASC) AS "rank",
           count(*) OVER () AS m
         FROM f WHERE p IS NOT NULL),
       qq AS (
         SELECT *, round(least(1.0, min(p * m / "rank") OVER
           (ORDER BY p ASC, c_nationkey ASC
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS q
         FROM r)
       SELECT c_nationkey, x, n, rate, z, p, "rank", q,
         q <= 0.05 AS reject
       FROM qq"""
  }

  /** Shared ANOVA finish over a `b(g, x)` CTE — mirrors
    * [[Eval.anovaCore]] term for term. */
  private val AnovaCoreSql =
    """gg AS (
         SELECT g, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
         FROM b GROUP BY g),
       t AS (
         SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n,
           sum(s * s / n) AS sb, sum(s) AS st,
           sum(ss - s * s / n) AS ssw
         FROM gg)
       SELECT
         CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
           round(((sb - st * st / n) / CAST(k - 1 AS DOUBLE))
             / (ssw / CAST(n - k AS DOUBLE)), 6)
         END AS f,
         k - 1 AS df1, n - k AS df2, k, n,
         round(sb - st * st / n, 6) AS ss_between,
         round(ssw, 6) AS ss_within
       FROM t"""

  private val CcfMaxLag = 3

  /** Cochran-Armitage oracle: identical level sums, the same trend z,
    * and the shared A&S erf p-value constants. */
  private def trendSql: String = {
    val a = Eval.ErfA
    s"""WITH b AS (
         SELECT CAST(floor(c_acctbal / 2000) AS BIGINT) AS s,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             AS y
         FROM orders JOIN customer ON o_custkey = c_custkey),
       l AS (
         SELECT s, CAST(sum(y) AS BIGINT) AS x, count(*) AS n
         FROM b GROUP BY s),
       t AS (
         SELECT CAST(sum(x) AS BIGINT) AS tx,
           CAST(sum(n) AS BIGINT) AS tn,
           count(*) AS n_levels,
           CAST(sum(s * x) AS BIGINT) AS ssx,
           CAST(sum(s * n) AS BIGINT) AS ssn1,
           CAST(sum(s * s * n) AS BIGINT) AS sssn,
           min_by(CAST(x AS DOUBLE) / n, s) AS rate_lo,
           max_by(CAST(x AS DOUBLE) / n, s) AS rate_hi
         FROM l),
       z0 AS (SELECT *, CAST(tx AS DOUBLE) / tn AS pr FROM t),
       z1 AS (
         SELECT *,
           pr * (1.0 - pr) * (CAST(sssn AS DOUBLE)
             - CAST(ssn1 AS DOUBLE) * ssn1 / tn) AS varr
         FROM z0),
       z2 AS (
         SELECT *,
           (CAST(ssx AS DOUBLE) - pr * ssn1) / sqrt(varr) AS zv
         FROM z1),
       ph AS (SELECT *, abs(zv) / ${Eval.Sqrt2} AS xv FROM z2),
       ph2 AS (SELECT *, 1.0 / (1.0 + ${Eval.ErfP} * xv) AS tv FROM ph)
       SELECT
         CASE WHEN varr > 0 THEN round(zv, 6) END AS z,
         CASE WHEN varr > 0 THEN round(
           2.0 * (1.0 - 0.5 * (1.0
             + (1.0 - tv * (${a(0)} + tv * (${a(1)} + tv * (${a(2)}
               + tv * (${a(3)} + tv * ${a(4)}))))
               * exp(-(xv * xv))))), 6)
         END AS p,
         tn AS n, n_levels,
         round(rate_lo, 6) AS rate_lo, round(rate_hi, 6) AS rate_hi
       FROM ph2"""
  }

  /** McNemar oracle: identical discordant counts, continuity-corrected
    * z, and the shared erf p constants. */
  private def mcNemarSql: String = {
    val a = Eval.ErfA
    s"""WITH b0 AS (
         SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             AS y,
           CASE WHEN (o_orderkey % 1000) / 1000.0 > 0.5 THEN 1 ELSE 0
             END AS pa,
           CASE WHEN (o_orderkey % 777) / 777.0 > 0.5 THEN 1 ELSE 0
             END AS pb
         FROM orders),
       t AS (
         SELECT count(*) AS n,
           CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
           CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
           CAST(sum(CASE WHEN pa = y THEN 1 ELSE 0 END) AS BIGINT)
             AS ra,
           CAST(sum(CASE WHEN pb = y THEN 1 ELSE 0 END) AS BIGINT)
             AS rb
         FROM b0),
       z0 AS (
         SELECT *,
           CAST(sign(b - c) AS DOUBLE)
             * (CAST(abs(b - c) AS DOUBLE) - 1)
             / sqrt(CAST(b + c AS DOUBLE)) AS zv,
           CAST(b + c AS DOUBLE) AS disc
         FROM t),
       ph AS (SELECT *, abs(zv) / ${Eval.Sqrt2} AS xv FROM z0),
       ph2 AS (SELECT *, 1.0 / (1.0 + ${Eval.ErfP} * xv) AS tv FROM ph)
       SELECT n, b, c,
         CASE WHEN disc > 0 THEN round(zv, 6) END AS z,
         CASE WHEN disc > 0 THEN round(
           2.0 * (1.0 - 0.5 * (1.0
             + (1.0 - tv * (${a(0)} + tv * (${a(1)} + tv * (${a(2)}
               + tv * (${a(3)} + tv * ${a(4)}))))
               * exp(-(xv * xv))))), 6)
         END AS p,
         round(CAST(ra AS DOUBLE) / n, 6) AS acc_a,
         round(CAST(rb AS DOUBLE) / n, 6) AS acc_b
       FROM ph2"""
  }

  /** RFM oracle: identical entity aggregate, nearest-rank quintile
    * edges per dimension (1-based rank `ceil(p·n)` — the orderStats
    * definition), and the same strictly-greater scoring. */
  private def rfmSql: String = {
    def edges(dim: String, tag: String) =
      s"""r$tag AS (
           SELECT $dim AS v,
             row_number() OVER (ORDER BY $dim) AS rn
           FROM cust),
         e$tag AS (
           SELECT
             max(CASE WHEN rn = greatest(1, CAST(ceil(0.2
               * (SELECT n FROM nn)) AS BIGINT)) THEN v END) AS b1,
             max(CASE WHEN rn = greatest(1, CAST(ceil(0.4
               * (SELECT n FROM nn)) AS BIGINT)) THEN v END) AS b2,
             max(CASE WHEN rn = greatest(1, CAST(ceil(0.6
               * (SELECT n FROM nn)) AS BIGINT)) THEN v END) AS b3,
             max(CASE WHEN rn = greatest(1, CAST(ceil(0.8
               * (SELECT n FROM nn)) AS BIGINT)) THEN v END) AS b4
           FROM r$tag)"""
    def score(dim: String, tag: String) =
      s"""1 + (CASE WHEN $dim > e$tag.b1 THEN 1 ELSE 0 END)
            + (CASE WHEN $dim > e$tag.b2 THEN 1 ELSE 0 END)
            + (CASE WHEN $dim > e$tag.b3 THEN 1 ELSE 0 END)
            + (CASE WHEN $dim > e$tag.b4 THEN 1 ELSE 0 END)"""
    s"""WITH cust AS (
         SELECT o_custkey,
           CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
             AS last_active,
           count(*) AS frequency,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS monetary
         FROM orders GROUP BY o_custkey),
       nn AS (SELECT count(*) AS n FROM cust),
       ${edges("last_active", "r")},
       ${edges("frequency", "f")},
       ${edges("monetary", "m")},
       s AS (
         SELECT cust.o_custkey, cust.last_active, cust.frequency,
           cust.monetary,
           ${score("cust.last_active", "r")} AS r_score,
           ${score("cust.frequency", "f")} AS f_score,
           ${score("cust.monetary", "m")} AS m_score
         FROM cust, er, ef, em)
       SELECT o_custkey, last_active, frequency, monetary,
         r_score, f_score, m_score,
         CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
           || CAST(m_score AS VARCHAR) AS segment
       FROM s"""
  }

  /** Mann-Kendall oracle: the same pairwise sign sum, tie-corrected
    * variance, continuity-corrected z, and shared erf p. */
  private def mannKendallSql: String = {
    val a = Eval.ErfA
    s"""WITH daily AS (
         SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
           count(*) AS cnt
         FROM events GROUP BY 1, 2),
       pr AS (
         SELECT a.event_type,
           CAST(sum(CAST(sign(CAST(b.cnt AS DOUBLE)
             - CAST(a.cnt AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND a.day < b.day
         GROUP BY a.event_type),
       ties AS (
         SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
           CAST(sum(c * (c - 1) * (c * 2 + 5)) AS BIGINT) AS tiesum
         FROM (SELECT event_type, cnt, count(*) AS c
               FROM daily GROUP BY 1, 2) tt
         GROUP BY event_type),
       j AS (
         SELECT pr.event_type, s, n, tiesum
         FROM pr JOIN ties USING (event_type)),
       v AS (
         SELECT *,
           (CAST(n AS DOUBLE) * (n - 1) * (2.0 * n + 5)
             - CAST(tiesum AS DOUBLE)) / 18.0 AS vars
         FROM j),
       z0 AS (
         SELECT *,
           (CASE WHEN s > 0 THEN CAST(s AS DOUBLE) - 1
                 WHEN s < 0 THEN CAST(s AS DOUBLE) + 1
                 ELSE 0.0 END) / sqrt(vars) AS zv
         FROM v),
       ph AS (SELECT *, abs(zv) / ${Eval.Sqrt2} AS xv FROM z0),
       ph2 AS (SELECT *, 1.0 / (1.0 + ${Eval.ErfP} * xv) AS tv FROM ph)
       SELECT event_type, n, s,
         CASE WHEN vars > 0 THEN round(zv, 6) END AS z,
         CASE WHEN vars > 0 THEN round(
           2.0 * (1.0 - 0.5 * (1.0
             + (1.0 - tv * (${a(0)} + tv * (${a(1)} + tv * (${a(2)}
               + tv * (${a(3)} + tv * ${a(4)}))))
               * exp(-(xv * xv))))), 6)
         END AS p
       FROM ph2"""
  }

  /** CCF oracle: identical shifted columns off one named window, the
    * same six conditioned moment sums per lag, and the same closed-form
    * correlation expression — associativity mirrored term for term. */
  private def ccfSql: String = {
    val lags = -CcfMaxLag to CcfMaxLag
    def nm(k: Int) = if (k < 0) s"m${-k}" else s"p$k"
    val shiftCols = lags.map(k =>
      if (k == 0) "y AS y_p0"
      else if (k > 0) s"lag(y, $k) OVER w AS y_${nm(k)}"
      else s"lead(y, ${-k}) OVER w AS y_${nm(k)}")
      .mkString(",\n             ")
    val aggCols = lags.map { k =>
      val y = s"y_${nm(k)}"
      val s = nm(k)
      s"""CAST(sum(CASE WHEN $y IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_$s,
           sum(CASE WHEN $y IS NOT NULL THEN x ELSE 0.0 END) AS sx_$s,
           sum(CASE WHEN $y IS NOT NULL THEN $y ELSE 0.0 END) AS sy_$s,
           sum(CASE WHEN $y IS NOT NULL THEN x * x ELSE 0.0 END)
             AS sxx_$s,
           sum(CASE WHEN $y IS NOT NULL THEN $y * $y ELSE 0.0 END)
             AS syy_$s,
           sum(CASE WHEN $y IS NOT NULL THEN x * $y ELSE 0.0 END)
             AS sxy_$s"""
    }.mkString(",\n           ")
    val pieces = lags.map { k =>
      val s = nm(k)
      val n = s"CAST(n_$s AS DOUBLE)"
      s"""SELECT event_type, $k AS lag,
           CASE WHEN n_$s > 1
               AND sxx_$s - sx_$s * sx_$s / $n > 0
               AND syy_$s - sy_$s * sy_$s / $n > 0
             THEN round((sxy_$s - sx_$s * sy_$s / $n)
               / sqrt((sxx_$s - sx_$s * sx_$s / $n)
                 * (syy_$s - sy_$s * sy_$s / $n)), 6)
           END AS ccf,
           n_$s AS n_pairs FROM g"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH daily AS (
         SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
           count(*) AS cnt
         FROM events GROUP BY 1, 2),
       b AS (
         SELECT d.event_type, d.day,
           CAST(d.cnt AS DOUBLE) AS x, CAST(p.cnt AS DOUBLE) AS y
         FROM daily d JOIN daily p
           ON d.day = p.day AND p.event_type = 'purchase'
         WHERE d.event_type <> 'purchase'),
       l AS (
         SELECT event_type, x, y,
             $shiftCols
         FROM b
         WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       g AS (
         SELECT event_type,
           $aggCols
         FROM l GROUP BY event_type)
       $pieces"""
  }

  /** Quantile-normalization oracle (shared by both physical paths):
    * distinct-value cumulatives on each side, the same pure-integer
    * nearest-rank formula, and a plain interval-containment join (the
    * Spark side's rank-space bin join computes the identical pairs). */
  private val quantileNormSql =
    """WITH src AS (
         SELECT CAST(l_extendedprice AS DOUBLE) AS s, l_returnflag AS g
         FROM lineitem
         WHERE l_extendedprice IS NOT NULL
           AND l_returnflag IN ('R', 'N')),
       a AS (SELECT s, count(*) AS c FROM src WHERE g = 'R' GROUP BY s),
       ar AS (
         SELECT s, c,
           CAST(coalesce(sum(c) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS below
         FROM a),
       an AS (SELECT CAST(sum(c) AS BIGINT) AS na FROM a),
       b AS (SELECT s, count(*) AS c FROM src WHERE g = 'N' GROUP BY s),
       br AS (
         SELECT s,
           CAST(coalesce(sum(c) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c
             AS BIGINT) AS cum
         FROM b),
       bn AS (SELECT CAST(max(cum) AS BIGINT) AS nb FROM br),
       k AS (
         SELECT br.s AS value,
           CAST((cum * na + nb - 1) // nb AS BIGINT) AS ref_rank
         FROM br, an, bn)
       SELECT k.value, ar.s AS normalized, k.ref_rank
       FROM k JOIN ar
         ON k.ref_rank > ar.below AND k.ref_rank <= ar.below + ar.c"""

  /** Exact-KS oracle (shared by both physical paths): distinct-value
    * per-group counts → inclusive ECDF cumulatives → argmax by
    * (d DESC, value ASC) — the same exact-integer divisions ksExact
    * performs. */
  private val ksExactSql =
    """WITH src AS (
         SELECT l_extendedprice AS s,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS la
         FROM lineitem
         WHERE l_extendedprice IS NOT NULL
           AND l_returnflag IN ('R', 'N')),
       c AS (
         SELECT s, CAST(sum(la) AS BIGINT) AS p,
           CAST(sum(1 - la) AS BIGINT) AS q
         FROM src GROUP BY s),
       r AS (
         SELECT s, p, q,
           CAST(coalesce(sum(p) OVER wb, 0) AS BIGINT) AS pb,
           CAST(coalesce(sum(q) OVER wb, 0) AS BIGINT) AS qb
         FROM c
         WINDOW wb AS (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       t AS (
         SELECT CAST(sum(p) AS BIGINT) AS na,
           CAST(sum(q) AS BIGINT) AS nb
         FROM c),
       dd AS (
         SELECT s,
           abs(CAST(pb + p AS DOUBLE) / na
             - CAST(qb + q AS DOUBLE) / nb) AS d,
           na, nb
         FROM r, t)
       SELECT round(d, 6) AS d, CAST(s AS DOUBLE) AS at_value,
         round(d * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
           / CAST(na + nb AS DOUBLE)), 6) AS z,
         na AS n_a, nb AS n_b
       FROM dd ORDER BY d DESC, s ASC LIMIT 1"""

  // ---- autocorrelation ----------------------------------------------------

  private val AcfMaxLag = 7

  /** ACF oracle: the same algebraic expansion [[Eval.acf]] runs —
    * per-lag co-product/paired-sum aggregates off one lag window, the
    * mean folded in symbolically, identical operator associativity on
    * both sides so the doubles replay bit-for-bit. */
  private def acfSql: String = {
    val lags = 1 to AcfMaxLag
    val lagCols = lags.map(k => s"lag(cnt, $k) OVER w AS l$k")
      .mkString(",\n             ")
    val aggCols = lags.map(k =>
      s"CAST(sum(cnt * l$k) AS DOUBLE) AS c$k,\n             " +
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN cnt END) AS DOUBLE)" +
      s" AS a$k,\n             " +
      s"CAST(sum(l$k) AS DOUBLE) AS b$k, count(l$k) AS np$k")
      .mkString(",\n             ")
    val pieces = lags.map(k =>
      s"""SELECT event_type, n, $k AS lag,
             CASE WHEN den > 0 THEN
               round((c$k - m * (a$k + b$k) + np$k * m * m) / den, 6)
             END AS acf,
             np$k AS n_pairs
           FROM g""").mkString("\n           UNION ALL\n           ")
    s"""WITH daily AS (
         SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
           count(*) AS cnt
         FROM events GROUP BY 1, 2),
       l AS (
         SELECT event_type, cnt,
             $lagCols
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       g0 AS (
         SELECT event_type, count(*) AS n,
             CAST(sum(cnt) AS DOUBLE) AS s,
             CAST(sum(cnt * cnt) AS DOUBLE) AS ss,
             $aggCols
         FROM l GROUP BY event_type),
       g AS (
         SELECT *, s / n AS m, ss - n * (s / n) * (s / n) AS den
         FROM g0)
       $pieces"""
  }

  // ---- ranking metrics ----------------------------------------------------

  private val RankK = 10

  /** Graded-relevance candidate lists: one "query" per customer, items
    * ranked by the deterministic pseudo-score. */
  private def rankedOrders(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      ((col("o_orderkey") % 1000).cast("double") / lit(1000.0)).as("score"),
      when(col("o_orderpriority") === "1-URGENT", 2L)
        .when(col("o_orderpriority") === "2-HIGH", 1L)
        .otherwise(0L).as("rel"))

  /** `CASE <rankExpr> WHEN 1 THEN tab(0) … ELSE 0 END` — the integer
    * discount/reciprocal tables embedded as the SAME constants the Spark
    * expression uses ([[Eval.dcgDiscounts]]/[[Eval.rrTable]]). */
  private def sqlTab(rankExpr: String, tab: Seq[Long]): String =
    s"CASE $rankExpr" + tab.zipWithIndex.map { case (v, i) =>
      s" WHEN ${i + 1} THEN $v" }.mkString + " ELSE 0 END"

  /** Shared per-query CTE chain for the ranking oracles: base candidate
    * lists → total-ordered ranks (score and ideal) → integer per-query
    * statistics, mirroring [[Eval.rankingInts]] column for column. */
  private def rankingPqSql: String = {
    val q = Eval.RankQ
    s"""WITH base AS (
         SELECT o_custkey AS q, o_orderkey AS i,
           $ScoreSql AS s,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 2
                WHEN o_orderpriority = '2-HIGH' THEN 1
                ELSE 0 END AS r
         FROM orders),
       ranked AS (
         SELECT q, r,
           row_number() OVER ws AS rs,
           row_number() OVER
             (PARTITION BY q ORDER BY r DESC, i ASC) AS ri,
           sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) OVER
             (ws ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cumrel
         FROM base
         WINDOW ws AS (PARTITION BY q ORDER BY s DESC, i ASC)),
       pq AS (
         SELECT q,
           CAST(sum(CASE WHEN rs <= $RankK
               THEN r * (${sqlTab("rs", Eval.dcgDiscounts(RankK))})
               ELSE 0 END) AS BIGINT) AS dcg,
           CAST(sum(CASE WHEN ri <= $RankK
               THEN r * (${sqlTab("ri", Eval.dcgDiscounts(RankK))})
               ELSE 0 END) AS BIGINT) AS idcg,
           CAST(max(CASE WHEN rs <= $RankK AND r > 0
               THEN ${sqlTab("rs", Eval.rrTable(RankK))}
               ELSE 0 END) AS BIGINT) AS rr,
           CAST(sum(CASE WHEN rs <= $RankK AND r > 0
               THEN CAST(floor(CAST(cumrel AS DOUBLE) * $q
                 / CAST(rs AS DOUBLE)) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS apnum,
           CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rel,
           count(*) AS n_items
         FROM ranked GROUP BY q)"""
  }

  def oracleSql: Map[String, String] = {
    val contAuc =
      aucSql("orders", "o_totalprice", "o_orderpriority = '1-URGENT'")
    val contPrAuc =
      prAucSql("orders", "o_totalprice", "o_orderpriority = '1-URGENT'")
    Map(
      "q_auc" -> aucSql("lineitem", "l_discount", "l_returnflag = 'R'"),
      "q_auc_cont" -> contAuc,
      "q_auc_binned" -> contAuc,
      "q_prauc" ->
        prAucSql("lineitem", "l_discount", "l_returnflag = 'R'"),
      "q_prauc_cont" -> contPrAuc,
      "q_prauc_binned" -> contPrAuc,

      "q_ece" ->
        s"""WITH base AS (
             SELECT $ScoreSql AS s,
               CAST(CASE WHEN $LabelSql THEN 1 ELSE 0 END AS DOUBLE) AS l
             FROM orders),
           b AS (
             SELECT least(CAST(floor(s * $CalBins) AS BIGINT),
                 ${CalBins - 1}) AS bin,
               count(*) AS n, avg(s) AS conf, avg(l) AS acc
             FROM base GROUP BY 1)
           SELECT
             round(sum(n * abs(conf - acc)) / CAST(sum(n) AS DOUBLE), 6)
               AS ece,
             CAST(sum(n) AS BIGINT) AS n
           FROM b""",

      "q_calibration" ->
        s"""SELECT least(CAST(floor(($ScoreSql) * $CalBins) AS BIGINT),
             ${CalBins - 1}) AS bin,
           count(*) AS n,
           round(avg($ScoreSql), 6) AS mean_score,
           round(avg(CASE WHEN $LabelSql THEN 1.0 ELSE 0.0 END), 6)
             AS pos_rate
           FROM orders GROUP BY 1""",

      // minimax replay: segment rates are single divisions of integer
      // prefix-sum differences — identical IEEE values both engines, so
      // min/max replay exactly; only the output rates round (6 dp)
      "q_isotonic" ->
        s"""WITH $IsotonicFitCtes
           SELECT b.bin, b.n, b.n_pos,
             round(CAST(b.n_pos AS DOUBLE) / b.n, 6) AS rate,
             round(iso.iso, 6) AS iso_rate
           FROM b JOIN iso USING (bin)""",

      // the serving replay: same fit, rounded iso_rate joined back by
      // bin (the Spark side joins the fitted — already-rounded — frame)
      "q_isotonic_score" ->
        s"""WITH $IsotonicFitCtes,
           fit AS (
             SELECT b.bin, round(iso.iso, 6) AS iso_rate
             FROM b JOIN iso USING (bin))
           SELECT o.o_orderkey,
             coalesce(f.iso_rate, 0.0) AS calibrated
           FROM orders o LEFT JOIN fit f
             ON least(CAST(floor(($ScoreSql) * $CalBins) AS BIGINT),
               ${CalBins - 1}) = f.bin""",

      "q_lift" ->
        s"""WITH b AS (
             SELECT least(CAST(floor((1.0 - ($ScoreSql)) * $LiftBuckets)
                 AS BIGINT), ${LiftBuckets - 1}) AS bucket,
               count(*) AS n,
               CAST(sum(CASE WHEN $LabelSql THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pos
             FROM orders GROUP BY 1)
           SELECT bucket, n, n_pos,
             round(CAST(sum(n_pos) OVER wc AS DOUBLE) /
               CAST(sum(n_pos) OVER wa AS DOUBLE), 6) AS gain,
             round((CAST(sum(n_pos) OVER wc AS DOUBLE) /
                 CAST(sum(n) OVER wc AS DOUBLE)) /
               (CAST(sum(n_pos) OVER wa AS DOUBLE) /
                 CAST(sum(n) OVER wa AS DOUBLE)), 6) AS lift
           FROM b
           WINDOW wc AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING),
             wa AS (ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING)""",

      "q_confusion" ->
        s"""WITH s AS (
             SELECT $ScoreSql AS s,
               CASE WHEN $LabelSql THEN 1 ELSE 0 END AS l
             FROM orders),
           x AS (
             SELECT t.threshold, s.s, s.l
             FROM s CROSS JOIN (SELECT unnest(
               [${ConfThresholds.mkString(", ")}]) AS threshold) t),
           c AS (
             SELECT threshold,
               CAST(sum(CASE WHEN s >= threshold AND l = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN s >= threshold AND l = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN s < threshold AND l = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN s < threshold AND l = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
             FROM x GROUP BY 1)
           SELECT threshold, tp, fp, fn, tn,
             CASE WHEN tp + fp > 0
               THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END
               AS "precision",
             CASE WHEN tp + fn > 0
               THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END
               AS recall,
             CASE WHEN 2 * tp + fp + fn > 0
               THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
           FROM c""",

      "q_survival" ->
        """WITH e AS (
             SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pu
             FROM events),
           subj AS (
             SELECT user_id, max(hour) - min(hour) AS duration,
               max(pu) AS ev
             FROM e GROUP BY 1),
           byt AS (
             SELECT duration,
               CAST(sum(ev) AS BIGINT) AS n_event,
               CAST(sum(1 - ev) AS BIGINT) AS n_censored
             FROM subj GROUP BY 1),
           r AS (
             SELECT duration, n_event, n_censored,
               CAST(sum(n_event + n_censored) OVER wa AS BIGINT) -
                 CAST(coalesce(sum(n_event + n_censored) OVER wb, 0)
                   AS BIGINT) AS n_risk
             FROM byt
             WINDOW wa AS (ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING),
               wb AS (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING))
           SELECT duration, n_risk, n_event, n_censored,
             CASE WHEN max(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END)
                 OVER wt > 0 THEN 0.0
               ELSE round(exp(sum(CASE WHEN n_event < n_risk
                 THEN ln(1.0 - CAST(n_event AS DOUBLE) / n_risk) END)
                 OVER wt), 6)
             END AS survival
           FROM r
           WINDOW wt AS (ORDER BY duration ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW)""",

      "q_ab_proportions" ->
        """WITH subj AS (
             SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted,
               CASE WHEN count(*) >= 10 THEN 'heavy' ELSE 'light' END
                 AS seg
             FROM events GROUP BY 1),
           m AS (
             SELECT
               CAST(sum(CASE WHEN seg = 'heavy' THEN converted END)
                 AS BIGINT) AS sa,
               CAST(count(CASE WHEN seg = 'heavy' THEN converted END)
                 AS BIGINT) AS na,
               CAST(sum(CASE WHEN seg = 'light' THEN converted END)
                 AS BIGINT) AS sb,
               CAST(count(CASE WHEN seg = 'light' THEN converted END)
                 AS BIGINT) AS nb
             FROM subj),
           f AS (
             SELECT sa, na, sb, nb,
               CAST(sa AS DOUBLE) / na AS pa,
               CAST(sb AS DOUBLE) / nb AS pb,
               CAST(sa + sb AS DOUBLE) / (na + nb) AS pool
             FROM m)
           SELECT round(pa, 6) AS p_a, round(pb, 6) AS p_b,
             round(pa - pb, 6) AS diff,
             round((pa - pb) / sqrt(pool * (1.0 - pool) *
               (1.0 / na + 1.0 / nb)), 6) AS z,
             na AS n_a, nb AS n_b
           FROM f""",

      "q_rate_ci" ->
        """WITH g AS (
             SELECT event_type, count(*) AS n,
               CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS successes
             FROM events GROUP BY 1),
           f AS (
             SELECT event_type, n, successes,
               CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p,
               CAST(n AS DOUBLE) AS nd
             FROM g)
           SELECT event_type, n, successes,
             round(p, 6) AS rate,
             round((p + (1.96 * 1.96) / (2.0 * nd)) /
                 (1.0 + (1.96 * 1.96) / nd) -
               (1.96 * sqrt(p * (1.0 - p) / nd +
                 (1.96 * 1.96) / (4.0 * nd * nd))) /
                 (1.0 + (1.96 * 1.96) / nd), 6) AS lo,
             round((p + (1.96 * 1.96) / (2.0 * nd)) /
                 (1.0 + (1.96 * 1.96) / nd) +
               (1.96 * sqrt(p * (1.0 - p) / nd +
                 (1.96 * 1.96) / (4.0 * nd * nd))) /
                 (1.0 + (1.96 * 1.96) / nd), 6) AS hi
           FROM f""",

      "q_seasonality" ->
        """WITH daily AS (
             SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               count(*) AS cnt
             FROM events GROUP BY 1, 2),
           d AS (
             SELECT event_type, CAST(day % 7 AS BIGINT) AS dow,
               avg(cnt) AS m, count(*) AS n_days
             FROM daily GROUP BY 1, 2),
           o AS (SELECT event_type, avg(cnt) AS om FROM daily GROUP BY 1)
           SELECT d.event_type, dow, n_days,
             round(m, 6) AS mean_value,
             round(m / om, 6) AS "index"
           FROM d JOIN o USING (event_type)""",

      "q_spearman" ->
        """WITH src AS (
             SELECT l_quantity AS a, l_extendedprice AS b
             FROM lineitem
             WHERE l_quantity IS NOT NULL
               AND l_extendedprice IS NOT NULL),
           ca AS (SELECT a AS v, count(*) AS c FROM src GROUP BY 1),
           ra AS (
             SELECT v,
               coalesce(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (c + 1) / 2.0 AS rk
             FROM ca),
           cb AS (SELECT b AS v, count(*) AS c FROM src GROUP BY 1),
           rb AS (
             SELECT v,
               coalesce(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (c + 1) / 2.0 AS rk
             FROM cb),
           j AS (
             SELECT ra.rk AS rka, rb.rk AS rkb
             FROM src JOIN ra ON src.a = ra.v JOIN rb ON src.b = rb.v)
           SELECT round(corr(rka, rkb), 6) AS rho,
             CAST(count(*) AS BIGINT) AS n
           FROM j""",

      "q_acf" -> acfSql,

      "q_bootstrap" -> bootstrapSql,

      "q_ccf" -> ccfSql,

      "q_fdr" -> fdrSql,

      "q_anova" ->
        s"""WITH b AS (
             SELECT l_linestatus AS g, CAST(l_quantity AS DOUBLE) AS x
             FROM lineitem
             WHERE l_quantity IS NOT NULL AND l_linestatus IS NOT NULL),
           $AnovaCoreSql""",

      "q_brown_forsythe" ->
        s"""WITH b0 AS (
             SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x
             FROM lineitem
             WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
           r AS (
             SELECT g, x,
               row_number() OVER (PARTITION BY g ORDER BY x ASC) AS rn,
               count(*) OVER (PARTITION BY g) AS n
             FROM b0),
           m AS (
             SELECT g AS mg, x AS med FROM r
             WHERE rn = greatest(1, CAST(ceil(n / 2.0) AS BIGINT))),
           b AS (
             SELECT b0.g, abs(b0.x - m.med) AS x
             FROM b0 JOIN m ON b0.g = m.mg),
           $AnovaCoreSql""",

      "q_ks_exact" -> ksExactSql,
      "q_ks_exact_binned" -> ksExactSql,

      "q_quantile_norm" -> quantileNormSql,
      "q_quantile_norm_binned" -> quantileNormSql,

      "q_trend" -> trendSql,

      "q_mann_kendall" -> mannKendallSql,

      "q_mcnemar" -> mcNemarSql,

      "q_uplift" ->
        """WITH b AS (
             SELECT least(CAST(floor(
                 (1.0 - (o_orderkey % 1000) / 1000.0) * 10) AS BIGINT),
                 9) AS bucket,
               CAST(o_orderkey % 2 AS BIGINT) AS t,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                 AS y
             FROM orders),
           g AS (
             SELECT bucket,
               CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_t,
               CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_c,
               CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT)
                 AS y_t,
               CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT)
                 AS y_c
             FROM b GROUP BY bucket),
           c AS (
             SELECT *,
               CAST(sum(n_t) OVER w AS BIGINT) AS cnt,
               CAST(sum(n_c) OVER w AS BIGINT) AS cnc,
               CAST(sum(y_t) OVER w AS BIGINT) AS cyt,
               CAST(sum(y_c) OVER w AS BIGINT) AS cyc
             FROM g
             WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING))
           SELECT bucket, n_t, n_c, y_t, y_c,
             CASE WHEN cnc > 0 THEN
               round(CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)
                 * (CAST(cnt AS DOUBLE) / cnc), 6)
             END AS cum_uplift
           FROM c""",

      "q_balance" ->
        """WITH m0 AS (
             SELECT l_returnflag AS g, unnest([
               struct_pack(f := 'l_quantity',
                 v := CAST(l_quantity AS DOUBLE)),
               struct_pack(f := 'l_extendedprice',
                 v := CAST(l_extendedprice AS DOUBLE)),
               struct_pack(f := 'l_discount',
                 v := CAST(l_discount AS DOUBLE)),
               struct_pack(f := 'l_tax', v := CAST(l_tax AS DOUBLE))
             ]) AS u
             FROM lineitem WHERE l_returnflag IN ('R', 'N')),
           m AS (
             SELECT g, u.f AS feature, u.v AS v
             FROM m0 WHERE u.v IS NOT NULL),
           gg AS (
             SELECT feature,
               CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               sum(CASE WHEN g = 'R' THEN v ELSE 0.0 END) AS sa,
               sum(CASE WHEN g = 'R' THEN v * v ELSE 0.0 END) AS ssa,
               CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT)
                 AS nb,
               sum(CASE WHEN g = 'N' THEN v ELSE 0.0 END) AS sb,
               sum(CASE WHEN g = 'N' THEN v * v ELSE 0.0 END) AS ssb
             FROM m GROUP BY feature),
           f AS (
             SELECT *,
               sqrt(((ssa - sa * sa / na) / (na - 1)
                 + (ssb - sb * sb / nb) / (nb - 1)) / 2.0) AS pooled
             FROM gg WHERE na > 1 AND nb > 1)
           SELECT feature, na AS n_a, nb AS n_b,
             round(sa / na, 6) AS mean_a,
             round(sb / nb, 6) AS mean_b,
             CASE WHEN pooled > 0 THEN
               round((sa / na - sb / nb) / pooled, 6)
             END AS smd
           FROM f""",

      "q_rank_movers" ->
        """WITH a AS (
             SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS period,
               CAST(count(*) AS BIGINT) AS value
             FROM events GROUP BY 1, 2),
           r AS (
             SELECT *,
               CAST(row_number() OVER (PARTITION BY period
                 ORDER BY value DESC, event_type ASC) AS BIGINT)
                 AS "rank"
             FROM a),
           f AS (
             SELECT *, lag("rank") OVER
               (PARTITION BY event_type ORDER BY period) AS prev_rank
             FROM r)
           SELECT event_type, period, value, "rank", prev_rank,
             "rank" - prev_rank AS rank_delta
           FROM f WHERE prev_rank IS NOT NULL""",

      "q_length_bands" ->
        """WITH r AS (
             SELECT source AS g, CAST(n_chars AS DOUBLE) AS x,
               row_number() OVER (PARTITION BY source
                 ORDER BY CAST(n_chars AS DOUBLE) ASC) AS rn,
               count(*) OVER (PARTITION BY source) AS n
             FROM documents WHERE n_chars IS NOT NULL)
           SELECT g AS source, max(n) AS n,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.25 * n) AS BIGINT)) THEN x END) AS p25,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.5 * n) AS BIGINT)) THEN x END) AS p50,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.75 * n) AS BIGINT)) THEN x END) AS p75,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.9 * n) AS BIGINT)) THEN x END) AS p90,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.99 * n) AS BIGINT)) THEN x END) AS p99
           FROM r GROUP BY g""",

      "q_simpson" ->
        """WITH b AS (
             SELECT c_nationkey AS st, c_mktsegment AS g,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                 AS y
             FROM orders JOIN customer ON o_custkey = c_custkey
             WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
           cells AS (
             SELECT st,
               CAST(sum(CASE WHEN g = 'BUILDING' THEN y ELSE 0 END)
                 AS BIGINT) AS xa,
               CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
                 AS BIGINT) AS na,
               CAST(sum(CASE WHEN g = 'MACHINERY' THEN y ELSE 0 END)
                 AS BIGINT) AS xb,
               CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END)
                 AS BIGINT) AS nb
             FROM b GROUP BY st),
           t AS (
             SELECT CAST(sum(xa) AS BIGINT) AS sxa,
               CAST(sum(na) AS BIGINT) AS sna,
               CAST(sum(xb) AS BIGINT) AS sxb,
               CAST(sum(nb) AS BIGINT) AS snb,
               count(*) AS n_strata,
               sum(CASE WHEN na > 0 AND nb > 0 THEN
                 CAST(na + nb AS DOUBLE)
                   * (CAST(xa AS DOUBLE) / na) END) AS wa,
               sum(CASE WHEN na > 0 AND nb > 0 THEN
                 CAST(na + nb AS DOUBLE)
                   * (CAST(xb AS DOUBLE) / nb) END) AS wb,
               sum(CASE WHEN na > 0 AND nb > 0 THEN
                 CAST(na + nb AS DOUBLE) END) AS w
             FROM cells)
           SELECT
             round(CAST(sxa AS DOUBLE) / sna, 6) AS rate_a,
             round(CAST(sxb AS DOUBLE) / snb, 6) AS rate_b,
             round(CAST(sxa AS DOUBLE) / sna
               - CAST(sxb AS DOUBLE) / snb, 6) AS crude_diff,
             round(wa / w, 6) AS adj_rate_a,
             round(wb / w, 6) AS adj_rate_b,
             round(wa / w - wb / w, 6) AS adj_diff,
             sna AS n_a, snb AS n_b, n_strata
           FROM t""",

      "q_mad_outliers" ->
        """WITH b AS (
             SELECT l_returnflag AS g,
               CAST(l_extendedprice AS DOUBLE) AS x
             FROM lineitem WHERE l_extendedprice IS NOT NULL),
           r1 AS (
             SELECT g, x,
               row_number() OVER (PARTITION BY g ORDER BY x ASC) AS rn,
               count(*) OVER (PARTITION BY g) AS n
             FROM b),
           m1 AS (
             SELECT g AS g1, x AS med FROM r1
             WHERE rn = greatest(1, CAST(ceil(n / 2.0) AS BIGINT))),
           d AS (
             SELECT b.g, b.x, abs(b.x - m1.med) AS dev, m1.med
             FROM b JOIN m1 ON b.g = m1.g1),
           r2 AS (
             SELECT g, dev, med,
               row_number() OVER (PARTITION BY g ORDER BY dev ASC)
                 AS rn,
               count(*) OVER (PARTITION BY g) AS n
             FROM d),
           m2 AS (
             SELECT g AS g2, dev AS mad FROM r2
             WHERE rn = greatest(1, CAST(ceil(n / 2.0) AS BIGINT))),
           f AS (
             SELECT d.g, d.dev, d.med, m2.mad
             FROM d JOIN m2 ON d.g = m2.g2)
           SELECT g AS l_returnflag, count(*) AS n,
             min(med) AS median, min(mad) AS mad,
             CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers,
             round(CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*), 6) AS outlier_share
           FROM f GROUP BY g""",

      "q_k_anonymity" ->
        """WITH g AS (
             SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               count(*) AS c
             FROM customer GROUP BY 1, 2, 3)
           SELECT CAST(5 AS BIGINT) AS k,
             CAST(sum(c) AS BIGINT) AS n_rows,
             count(*) AS n_groups,
             CAST(min(c) AS BIGINT) AS min_group_size,
             CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_groups,
             CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
               AS violating_rows,
             round(CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END)
               AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
               AS violating_share,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS unique_rows
           FROM g""",

      "q_l_diversity" ->
        """WITH g AS (
             SELECT c_nationkey, c_mktsegment, count(*) AS c,
               count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                 AS d
             FROM customer GROUP BY 1, 2)
           SELECT CAST(2 AS BIGINT) AS l, count(*) AS n_groups,
             CAST(min(d) AS BIGINT) AS min_distinct,
             CAST(sum(CASE WHEN d < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_groups,
             CAST(sum(CASE WHEN d < 2 THEN c ELSE 0 END) AS BIGINT)
               AS violating_rows,
             round(CAST(sum(CASE WHEN d < 2 THEN c ELSE 0 END)
               AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
               AS violating_share
           FROM g""",

      "q_series_completeness" ->
        """WITH daily AS (
             SELECT DISTINCT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS p
             FROM events),
           g AS (
             SELECT event_type, p,
               p - lag(p) OVER
                 (PARTITION BY event_type ORDER BY p) AS gap
             FROM daily)
           SELECT event_type,
             min(p) AS first_p, max(p) AS last_p,
             max(p) - min(p) + 1 AS span,
             count(*) AS observed,
             round(CAST(count(*) AS DOUBLE) / (max(p) - min(p) + 1), 6)
               AS completeness,
             coalesce(greatest(max(gap) - 1, 0), 0) AS max_missing_run
           FROM g GROUP BY event_type""",

      "q_dup_size_profile" ->
        """WITH g AS (
             SELECT text, count(*) AS c FROM documents GROUP BY text),
           s AS (
             SELECT c AS group_size, count(*) AS n_groups,
               CAST(sum(c) AS BIGINT) AS n_rows
             FROM g GROUP BY c),
           t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tot FROM s)
           SELECT group_size, n_groups, n_rows,
             round(CAST(n_rows AS DOUBLE) / CAST(tot AS DOUBLE), 6)
               AS row_share
           FROM s, t""",

      "q_rfm" -> rfmSql,

      "q_churn_labels" ->
        """WITH e AS (
             SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t
             FROM events WHERE ts IS NOT NULL),
           c AS (SELECT max(t) - 604800000000 AS cutoff FROM e),
           g AS (
             SELECT user_id,
               CAST(sum(CASE WHEN t <= cutoff THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_before,
               min(CASE WHEN t <= cutoff THEN t END) AS first_seen,
               max(CASE WHEN t <= cutoff THEN t END) AS last_seen,
               max(cutoff) AS cut,
               CAST(max(CASE WHEN t > cutoff THEN 1 ELSE 0 END)
                 AS BIGINT) AS active_after
             FROM e, c GROUP BY user_id)
           SELECT user_id, n_before, first_seen, last_seen,
             cut - last_seen AS recency, active_after
           FROM g WHERE n_before > 0""",

      "q_audience_overlap" ->
        """WITH pres AS (
             SELECT DISTINCT event_type AS g, user_id AS id
             FROM events
             WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
           sizes AS (SELECT g, count(*) AS n FROM pres GROUP BY g),
           pairs AS (
             SELECT l.g AS group_a, r.g AS group_b, count(*) AS n_both
             FROM pres l JOIN pres r
               ON l.id = r.id AND l.g < r.g
             GROUP BY 1, 2)
           SELECT group_a, group_b,
             sa.n AS n_a, sb.n AS n_b,
             CAST(n_both AS BIGINT) AS n_both,
             round(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6)
               AS jaccard,
             round(CAST(n_both AS DOUBLE) / least(sa.n, sb.n), 6)
               AS containment
           FROM pairs
           JOIN sizes sa ON group_a = sa.g
           JOIN sizes sb ON group_b = sb.g""",

      "q_inter_arrival" ->
        """WITH e AS (
             SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t
             FROM events),
           g AS (
             SELECT user_id, t, t - lag(t) OVER w AS gap,
               count(*) OVER (PARTITION BY user_id) AS nev
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY t)),
           q AS (
             SELECT user_id, gap, t, nev,
               row_number() OVER
                 (PARTITION BY user_id ORDER BY gap ASC) AS rn,
               row_number() OVER
                 (PARTITION BY user_id ORDER BY t DESC, gap DESC)
                 AS rnl,
               count(*) OVER (PARTITION BY user_id) AS ng
             FROM g WHERE gap IS NOT NULL)
           SELECT user_id, max(nev) AS n_events,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.5 * ng) AS BIGINT)) THEN gap END)
               AS median_gap,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.9 * ng) AS BIGINT)) THEN gap END) AS p90_gap,
             max(gap) AS max_gap,
             max(CASE WHEN rnl = 1 THEN gap END) AS last_gap
           FROM q GROUP BY user_id""",

      "q_ess" ->
        """WITH w AS (
             SELECT CAST(floor(o_totalprice / 100) AS BIGINT) AS wt
             FROM orders)
           SELECT count(*) AS n,
             round(CAST(sum(wt) AS DOUBLE) * CAST(sum(wt) AS DOUBLE)
               / CAST(sum(wt * wt) AS DOUBLE), 6) AS ess,
             round(CAST(sum(wt) AS DOUBLE) * CAST(sum(wt) AS DOUBLE)
               / CAST(sum(wt * wt) AS DOUBLE) / count(*), 6)
               AS ess_ratio
           FROM w WHERE wt IS NOT NULL AND wt > 0""",

      "q_forecast_backtest" ->
        """WITH daily AS (
             SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               CAST(count(*) AS DOUBLE) AS x
             FROM events GROUP BY event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000),
           l AS (
             SELECT event_type, x,
               lag(x, 7) OVER w AS fs, lag(x, 1) OVER w AS f1
             FROM daily
             WINDOW w AS (PARTITION BY event_type ORDER BY day)),
           g AS (
             SELECT event_type,
               CAST(sum(CASE WHEN fs IS NOT NULL AND f1 IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
               sum(CASE WHEN fs IS NOT NULL AND f1 IS NOT NULL
                 THEN abs(x - fs) ELSE 0.0 END) AS es,
               sum(CASE WHEN fs IS NOT NULL AND f1 IS NOT NULL
                 THEN (x - fs) * (x - fs) ELSE 0.0 END) AS ss,
               sum(CASE WHEN fs IS NOT NULL AND f1 IS NOT NULL
                 THEN abs(x - f1) ELSE 0.0 END) AS e1,
               sum(CASE WHEN fs IS NOT NULL AND f1 IS NOT NULL
                 THEN (x - f1) * (x - f1) ELSE 0.0 END) AS s1
             FROM l GROUP BY event_type)
           SELECT event_type, n_eval,
             round(es / n_eval, 6) AS mae_season,
             round(sqrt(ss / n_eval), 6) AS rmse_season,
             round(e1 / n_eval, 6) AS mae_naive,
             round(sqrt(s1 / n_eval), 6) AS rmse_naive,
             CASE WHEN e1 > 0 THEN round(1.0 - es / e1, 6) END AS skill
           FROM g WHERE n_eval > 0""",

      "q_weighted_percentiles" ->
        """WITH b AS (
             SELECT l_returnflag AS g,
               CAST(l_extendedprice AS DOUBLE) AS x,
               CAST(l_quantity AS BIGINT) AS w
             FROM lineitem
             WHERE l_extendedprice IS NOT NULL
               AND l_quantity IS NOT NULL
               AND CAST(l_quantity AS BIGINT) > 0),
           c AS (
             SELECT g, x,
               CAST(sum(w) OVER (PARTITION BY g ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS wt
             FROM b)
           SELECT g AS l_returnflag, max(wt) AS w_total,
             min(CASE WHEN CAST(cw AS DOUBLE) >=
               0.25 * CAST(wt AS DOUBLE) THEN x END) AS wp25,
             min(CASE WHEN CAST(cw AS DOUBLE) >=
               0.5 * CAST(wt AS DOUBLE) THEN x END) AS wp50,
             min(CASE WHEN CAST(cw AS DOUBLE) >=
               0.75 * CAST(wt AS DOUBLE) THEN x END) AS wp75
           FROM c GROUP BY g""",

      "q_percentile_bands" ->
        """WITH r AS (
             SELECT l_returnflag AS g,
               CAST(l_extendedprice AS DOUBLE) AS x,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY CAST(l_extendedprice AS DOUBLE) ASC) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
             FROM lineitem WHERE l_extendedprice IS NOT NULL)
           SELECT g AS l_returnflag, max(n) AS n,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.25 * n) AS BIGINT)) THEN x END) AS p25,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.5 * n) AS BIGINT)) THEN x END) AS p50,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.75 * n) AS BIGINT)) THEN x END) AS p75,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.9 * n) AS BIGINT)) THEN x END) AS p90,
             max(CASE WHEN rn = greatest(1,
               CAST(ceil(0.99 * n) AS BIGINT)) THEN x END) AS p99
           FROM r GROUP BY g""",

      "q_trimmed_mean" ->
        """WITH r AS (
             SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY CAST(l_quantity AS DOUBLE) ASC) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
             FROM lineitem WHERE l_quantity IS NOT NULL),
           k AS (SELECT *, CAST(floor(0.1 * n) AS BIGINT) AS kk FROM r)
           SELECT g AS l_returnflag,
             max(n) AS n,
             CAST(sum(CASE WHEN rn > kk AND rn <= n - kk
               THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
             round(sum(CASE WHEN rn > kk AND rn <= n - kk
                 THEN x ELSE 0.0 END)
               / sum(CASE WHEN rn > kk AND rn <= n - kk
                 THEN 1 ELSE 0 END), 6) AS trimmed_mean,
             round(sum(x) / count(*), 6) AS mean
           FROM k GROUP BY g""",

      "q_changepoint" ->
        """WITH daily AS (
             SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               count(*) AS cnt
             FROM events GROUP BY 1, 2),
           c AS (
             SELECT event_type, day,
               CAST(count(*) OVER wc AS DOUBLE) AS cn,
               CAST(sum(cnt) OVER wc AS DOUBLE) AS cs,
               CAST(sum(cnt * cnt) OVER wc AS DOUBLE) AS css,
               CAST(count(*) OVER wa AS DOUBLE) AS tn,
               CAST(sum(cnt) OVER wa AS DOUBLE) AS ts,
               CAST(sum(cnt * cnt) OVER wa AS DOUBLE) AS tss
             FROM daily
             WINDOW wc AS (PARTITION BY event_type ORDER BY day
                 ROWS UNBOUNDED PRECEDING),
               wa AS (PARTITION BY event_type)),
           s1 AS (
             SELECT *,
               (css - cs * cs / cn)
                 + ((tss - css)
                   - (ts - cs) * (ts - cs) / (tn - cn)) AS sse
             FROM c WHERE cn < tn),
           s2 AS (
             SELECT *, row_number() OVER
               (PARTITION BY event_type ORDER BY sse ASC, day ASC) AS rk
             FROM s1)
           SELECT event_type, CAST(tn AS BIGINT) AS n, day AS split_at,
             round(tss - ts * ts / tn, 6) AS sse_total,
             round(sse, 6) AS sse_split,
             round(tss - ts * ts / tn - sse, 6) AS gain,
             round(cs / cn, 6) AS mean_left,
             round((ts - cs) / (tn - cn), 6) AS mean_right
           FROM s2 WHERE rk = 1""",

      "q_ranking" ->
        s"""$rankingPqSql
           SELECT
             CASE WHEN sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) > 0
               THEN round(
                 sum(CASE WHEN n_rel > 0
                   THEN floor(CAST(dcg AS DOUBLE) * ${Eval.RankQ}
                     / CAST(idcg AS DOUBLE)) ELSE 0 END)
                 / (${Eval.RankQ}.0 *
                   sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END)), 6)
             END AS ndcg,
             CASE WHEN sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) > 0
               THEN round(
                 sum(CASE WHEN n_rel > 0 THEN rr ELSE 0 END)
                 / (${Eval.RankQ}.0 *
                   sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END)), 6)
             END AS mrr,
             CASE WHEN sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) > 0
               THEN round(
                 sum(CASE WHEN n_rel > 0
                   THEN floor(CAST(apnum AS DOUBLE)
                     / least(n_rel, $RankK)) ELSE 0 END)
                 / (${Eval.RankQ}.0 *
                   sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END)), 6)
             END AS "map",
             count(*) AS n_queries,
             CAST(sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_scored
           FROM pq""",

      "q_ranking_per_query" ->
        s"""$rankingPqSql
           SELECT q AS o_custkey,
             CASE WHEN n_rel > 0 THEN
               round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6)
             END AS ndcg,
             CASE WHEN n_rel > 0 THEN
               round(CAST(rr AS DOUBLE) / ${Eval.RankQ}.0, 6)
             END AS rr,
             CASE WHEN n_rel > 0 THEN
               round(CAST(apnum AS DOUBLE) / least(n_rel, $RankK)
                 / ${Eval.RankQ}.0, 6)
             END AS ap,
             n_rel, n_items
           FROM pq""",

      "q_ab_ttest" ->
        """WITH src AS (
             SELECT o_totalprice AS v, o_orderpriority AS g
             FROM orders
             WHERE o_totalprice IS NOT NULL
               AND o_orderpriority IN ('1-URGENT', '5-LOW')),
           m AS (
             SELECT
               avg(CASE WHEN g = '1-URGENT' THEN v END) AS ma,
               var_samp(CASE WHEN g = '1-URGENT' THEN v END) AS va,
               CAST(count(CASE WHEN g = '1-URGENT' THEN v END) AS BIGINT)
                 AS na,
               avg(CASE WHEN g = '5-LOW' THEN v END) AS mb,
               var_samp(CASE WHEN g = '5-LOW' THEN v END) AS vb,
               CAST(count(CASE WHEN g = '5-LOW' THEN v END) AS BIGINT)
                 AS nb
             FROM src)
           SELECT
             round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t,
             round((va / na + vb / nb) * (va / na + vb / nb) /
               ((va / na) * (va / na) / (na - 1) +
                (vb / nb) * (vb / nb) / (nb - 1)), 6) AS df,
             round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
             na AS n_a, nb AS n_b
           FROM m""",

      "q_ab_ranksum" ->
        """WITH c AS (
             SELECT l_discount AS s,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                 AS BIGINT) AS p,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
                 AS BIGINT) AS q
             FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1),
           r AS (
             SELECT p, q,
               CAST(coalesce(sum(q) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS nb
             FROM c),
           u AS (
             SELECT sum(p * (nb + q / 2.0)) AS u,
               sum(CAST(p + q AS DOUBLE) * (p + q) * (p + q) - (p + q))
                 AS ties,
               CAST(sum(p) AS BIGINT) AS n_pos,
               CAST(sum(q) AS BIGINT) AS n_neg
             FROM r),
           f AS (
             SELECT u, ties, n_pos, n_neg,
               CAST(n_pos AS DOUBLE) AS p, CAST(n_neg AS DOUBLE) AS q,
               CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE) AS n
             FROM u)
           SELECT u,
             round((u - p * q / 2.0) / sqrt(p * q / 12.0 *
               ((n + 1.0) - ties / (n * (n - 1.0)))), 6) AS z,
             round(u / (p * q), 6) AS auc,
             n_pos, n_neg
           FROM f""",

      "q_gini" -> GiniSql,
      "q_gini_binned" -> GiniSql,

      "q_feature_audit" -> featureAuditSql("orders", AuditFeatures),
      "q_psi_sweep" -> psiSweepSql("orders", AuditFeatures, 1996, 1997),

      "q_conformal" ->
        s"""WITH li AS (
             SELECT l_orderkey,
               abs(l_quantity * 1000.0 - l_extendedprice) AS r
             FROM lineitem),
           calib AS (SELECT r FROM li WHERE l_orderkey % 2 = 0),
           nn AS (SELECT CAST(count(*) AS BIGINT) AS n_calib FROM calib),
           kk AS (SELECT
               CAST(ceil((n_calib + 1) * ${1 - ConformalAlpha}) AS BIGINT)
                 AS k,
               n_calib
             FROM nn),
           q AS (
             SELECT r AS qhat
             FROM (SELECT r, row_number() OVER (ORDER BY r) AS rk
                   FROM calib), kk
             WHERE rk = least(k, n_calib)),
           t AS (
             SELECT
               round(avg(CASE WHEN r <= qhat THEN 1.0 ELSE 0.0 END), 6)
                 AS coverage,
               count(*) AS n_test
             FROM li, q WHERE l_orderkey % 2 <> 0)
           SELECT qhat, coverage, n_calib, n_test FROM q, t, nn""",

      "q_kappa" ->
        """WITH t AS (
             SELECT o_orderpriority AS a,
               CASE WHEN o_orderkey % 7 < 5 THEN o_orderpriority
                 ELSE '3-MEDIUM' END AS b
             FROM orders WHERE o_orderpriority IS NOT NULL),
           nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
           ag AS (SELECT CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END)
             AS BIGINT) AS agree FROM t),
           ma AS (SELECT a AS c, count(*) AS ca FROM t GROUP BY 1),
           mb AS (SELECT b AS c, count(*) AS cb FROM t GROUP BY 1),
           pe AS (SELECT sum(CAST(ca AS DOUBLE) * cb) AS pesum
             FROM ma JOIN mb USING (c))
           SELECT
             CASE WHEN pesum / (CAST(n AS DOUBLE) * n) < 1.0 THEN
               round((agree / CAST(n AS DOUBLE)
                   - pesum / (CAST(n AS DOUBLE) * n))
                 / (1.0 - pesum / (CAST(n AS DOUBLE) * n)), 6) END
               AS kappa,
             round(agree / CAST(n AS DOUBLE), 6) AS po,
             round(pesum / (CAST(n AS DOUBLE) * n), 6) AS pe,
             n
           FROM nn, ag, pe""",

      "q_multiclass" ->
        """WITH t AS (
             SELECT o_orderpriority AS a,
               CASE WHEN o_orderkey % 7 < 5 THEN o_orderpriority
                 ELSE '3-MEDIUM' END AS p
             FROM orders WHERE o_orderpriority IS NOT NULL),
           c AS (SELECT a, p, count(*) AS o FROM t GROUP BY 1, 2),
           aa AS (SELECT a AS class, CAST(sum(o) AS BIGINT) AS n_actual
             FROM c GROUP BY 1),
           pp AS (SELECT p AS class, CAST(sum(o) AS BIGINT) AS n_pred
             FROM c GROUP BY 1),
           dd AS (SELECT a AS class, CAST(sum(o) AS BIGINT) AS tp
             FROM c WHERE a = p GROUP BY 1),
           j AS (SELECT coalesce(aa.class, pp.class) AS class,
               coalesce(n_actual, 0) AS n_actual,
               coalesce(n_pred, 0) AS n_pred
             FROM aa FULL JOIN pp ON aa.class = pp.class),
           j2 AS (SELECT j.class, n_actual, n_pred,
               coalesce(tp, 0) AS tp
             FROM j LEFT JOIN dd ON j.class = dd.class)
           SELECT class, n_actual, n_pred, tp,
             CASE WHEN n_pred > 0
               THEN round(CAST(tp AS DOUBLE) / n_pred, 6) END
               AS "precision",
             CASE WHEN n_actual > 0
               THEN round(CAST(tp AS DOUBLE) / n_actual, 6) END
               AS recall,
             CASE WHEN n_pred + n_actual > 0
               THEN round(2.0 * tp / (n_pred + n_actual), 6) END AS f1
           FROM j2""",

      "q_fairness" ->
        s"""WITH base AS (
             SELECT o_orderstatus, $ScoreSql AS s,
               CASE WHEN $LabelSql THEN 1 ELSE 0 END AS l
             FROM orders),
           c AS (
             SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CASE WHEN s >= $FairnessThreshold AND l = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN s >= $FairnessThreshold AND l = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN s < $FairnessThreshold AND l = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN s < $FairnessThreshold AND l = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
             FROM base GROUP BY ROLLUP (o_orderstatus))
           SELECT o_orderstatus, n, tp, fp, fn, tn,
             CASE WHEN tp + fn > 0
               THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS tpr,
             CASE WHEN fp + tn > 0
               THEN round(CAST(fp AS DOUBLE) / (fp + tn), 6) END AS fpr,
             CASE WHEN tp + fp > 0
               THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END
               AS "precision",
             CASE WHEN n > 0
               THEN round(CAST(tp + fn AS DOUBLE) / n, 6) END
               AS base_rate
           FROM c""",

      "q_brier" ->
        s"""WITH base AS (
             SELECT $ScoreSql AS s,
               CAST(CASE WHEN $LabelSql THEN 1 ELSE 0 END AS DOUBLE) AS l
             FROM orders),
           g AS (
             SELECT s, l,
               greatest($ScoreEps, least(1.0 - $ScoreEps, s)) AS sc
             FROM base)
           SELECT
             round(avg((s - l) * (s - l)), 6) AS brier,
             round(avg(-(l * ln(sc) + (1.0 - l) * ln(1.0 - sc))), 6)
               AS logloss,
             count(*) AS n
           FROM g""",

      "q_survival_grouped" ->
        """WITH e AS (
             SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pu
             FROM events),
           subj AS (
             SELECT user_id, max(hour) - min(hour) AS duration,
               max(pu) AS ev,
               CASE WHEN count(*) >= 10 THEN 'heavy' ELSE 'light' END
                 AS seg
             FROM e GROUP BY 1),
           byt AS (
             SELECT seg, duration,
               CAST(sum(ev) AS BIGINT) AS n_event,
               CAST(sum(1 - ev) AS BIGINT) AS n_censored
             FROM subj GROUP BY 1, 2),
           r AS (
             SELECT seg, duration, n_event, n_censored,
               CAST(sum(n_event + n_censored) OVER wa AS BIGINT) -
                 CAST(coalesce(sum(n_event + n_censored) OVER wb, 0)
                   AS BIGINT) AS n_risk
             FROM byt
             WINDOW wa AS (PARTITION BY seg ROWS BETWEEN UNBOUNDED
                 PRECEDING AND UNBOUNDED FOLLOWING),
               wb AS (PARTITION BY seg ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           SELECT seg, duration, n_risk, n_event, n_censored,
             CASE WHEN max(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END)
                 OVER wt > 0 THEN 0.0
               ELSE round(exp(sum(CASE WHEN n_event < n_risk
                 THEN ln(1.0 - CAST(n_event AS DOUBLE) / n_risk) END)
                 OVER wt), 6)
             END AS survival
           FROM r
           WINDOW wt AS (PARTITION BY seg ORDER BY duration
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

      "q_benford" ->
        """WITH c AS (
             SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100)
                 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               count(*) AS n
             FROM orders
             WHERE o_totalprice IS NOT NULL
               AND CAST(floor(o_totalprice * 100) AS BIGINT) > 0
             GROUP BY 1)
           SELECT digit, n,
             round(CAST(n AS DOUBLE) /
               CAST(sum(n) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND
                 UNBOUNDED FOLLOWING) AS DOUBLE), 6) AS observed,
             round(log(10.0, 1.0 + 1.0 / digit), 6) AS expected
           FROM c""",

      "q_zipf" ->
        """WITH tok AS (
             SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
               AS t
             FROM documents),
           cnt AS (
             SELECT t, count(*) AS n_occurrences FROM tok
             WHERE t <> '' GROUP BY t),
           v AS (
             SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC,
                 t) - 1 AS BIGINT) AS token_id, n_occurrences
             FROM cnt
             ORDER BY token_id LIMIT 500)
           SELECT
             round(regr_slope(ln(n_occurrences), ln(token_id + 1)), 6)
               AS slope,
             round(regr_intercept(ln(n_occurrences), ln(token_id + 1)),
               6) AS intercept,
             round(regr_r2(ln(n_occurrences), ln(token_id + 1)), 6)
               AS r2,
             CAST(count(*) AS BIGINT) AS n
           FROM v""",

      "q_cusum" ->
        s"""WITH daily AS (
             SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               count(*) AS cnt
             FROM events GROUP BY 1, 2),
           p AS (
             SELECT event_type, day, cnt,
               sum(cnt - $CusumTarget - $CusumSlack) OVER w AS pf
             FROM daily
             WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING))
           SELECT event_type, day, cnt,
             pf - least(0.0, min(pf) OVER w2) AS cusum,
             (pf - least(0.0, min(pf) OVER w2)) > $CusumH AS alarm
           FROM p
           WINDOW w2 AS (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING)""")
  }
}
