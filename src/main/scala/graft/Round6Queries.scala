package graft

import graft.relational.Sketches
import graft.sim.Cluster
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions: distributed k-means (generated bit-exact Lloyd's
  * replay oracle), mergeable HLL sketches, boilerplate removal, and wider
  * TPC-H regression shapes. Every query here is fully DuckDB-oracled; the
  * iterative ones (k-means) generate their oracle SQL from the same
  * parameters the Spark query runs with, so the two sides cannot drift. */
object Round6Queries {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fit-once memo for the q_langid family (VERDICT r7 #6): the fitted
    * profile is bounded driver state (#langs × topK rows — the same
    * contract as the encoder dictionaries), keyed by (data dir, mtime)
    * via [[graft.util.FitMemo]] — bounded entries, staleness-safe, fit
    * cost reported in the bench artifact's fit_sec (ADVICE r8) — so the
    * warmup scale and the bench scale never cross. The three family
    * queries classify against the SAME fitted relation, exactly like a
    * production curation run that fits a profile once and serves it to
    * every classify pass; the forced join-path twin keeps its plan shape
    * (the memoized rows come back as a small local relation that the
    * classify broadcast-joins). */
  private val langidProfileMemo =
    new graft.util.FitMemo[Seq[(String, String, Long)]]("langid_profile")
  private def langidProfile(s: SparkSession, d: String): DataFrame = {
    val rows = langidProfileMemo.getOrFit(d)(
      graft.text.LangId.fitProfiles(t(s, d, "documents"), "text", "lang",
          n = 3, topK = 64)
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))))
    import s.implicits._
    rows.toDF("lang", "gram", "rank")
  }

  // ---- k-means -----------------------------------------------------------

  private val KmK = 4
  private val KmIters = 3
  private val KmDims = 8

  /** Generated Lloyd's replay: unrolled iteration CTEs over floor-quantized
    * integer vectors. Exactness argument lives in [[graft.sim.Cluster]]
    * (exact long sums, IEEE divisions, left-assoc distance folds, `<=`
    * tie cascade) — both engines execute the identical arithmetic. */
  /** Exemplar variant: same unrolled fit, final select ranks members by
    * distance to their assigned centroid — (dist ASC, id ASC), the
    * identical total order the Spark TopK heap keeps. */
  private def kmeansExemplarsSql(k: Int, iters: Int, dims: Int,
      topN: Int): String = {
    val base = kmeansSql(k, iters, dims)
    // swap the final SELECT: reuse everything up to the last SELECT
    val cut = base.lastIndexOf("SELECT id AS vec_id")
    val prefix = base.substring(0, cut)
    val distCase = (0 until k - 1).foldRight(s"d${k - 1}") { (j, rest) =>
      s"CASE WHEN cl = $j THEN d$j ELSE $rest END"
    }
    val assignCase = {
      val cases = (0 until k - 1).map { j =>
        val conds = ((j + 1) until k).map(l => s"d$j <= d$l")
          .mkString(" AND ")
        s"WHEN $conds THEN $j"
      }.mkString(" ")
      s"CASE $cases ELSE ${k - 1} END"
    }
    def dist(j: Int) = (0 until dims).map(i =>
      s"(x$i - c${j}_$i) * (x$i - c${j}_$i)").mkString(" + ")
    s"""$prefix, fin AS (
       SELECT id, cl, $distCase AS dist FROM (
         SELECT id, $assignCase AS cl,
           ${(0 until k).map(j => s"d$j").mkString(", ")}
         FROM (SELECT q.*, ${(0 until k).map(j => s"${dist(j)} AS d$j")
      .mkString(", ")}
         FROM q CROSS JOIN cent$iters)))
       SELECT cluster, vec_id, dist2, rank FROM (
         SELECT cl AS cluster, id AS vec_id, dist AS dist2,
           CAST(row_number() OVER (PARTITION BY cl ORDER BY dist, id)
             AS BIGINT) AS rank
         FROM fin)
       WHERE rank <= $topN"""
  }

  private def kmeansSql(k: Int, iters: Int, dims: Int): String = {
    val xs = (0 until dims).map(i => s"x$i")
    def dist(j: Int) = xs.zipWithIndex
      .map { case (x, i) => s"($x - c${j}_$i) * ($x - c${j}_$i)" }
      .mkString(" + ")
    def assignCase = {
      val cases = (0 until k - 1).map { j =>
        val conds = ((j + 1) until k).map(l => s"d$j <= d$l")
          .mkString(" AND ")
        s"WHEN $conds THEN $j"
      }.mkString(" ")
      s"CASE $cases ELSE ${k - 1} END"
    }
    val qCte =
      s"""q AS (SELECT vec_id AS id,
         ${xs.zipWithIndex.map { case (x, i) =>
        s"floor(embedding[${i + 1}]::DOUBLE * 1048576.0) AS $x" }
        .mkString(", ")}
         FROM embeddings)"""
    val cent0 =
      s"""cent0 AS (SELECT
         ${(0 until k).flatMap(j => xs.zipWithIndex.map { case (x, i) =>
        s"max(CASE WHEN rn = ${j + 1} THEN $x END) AS c${j}_$i" })
        .mkString(", ")}
         FROM (SELECT q.*, row_number() OVER (ORDER BY id) AS rn FROM q)
         WHERE rn <= $k)"""
    val iterCtes = (1 to iters).map { it =>
      val a =
        s"""a$it AS (SELECT id, ${xs.mkString(", ")}, $assignCase AS cl
           FROM (SELECT q.*, ${(0 until k).map(j => s"${dist(j)} AS d$j")
          .mkString(", ")}
           FROM q CROSS JOIN cent${it - 1}))"""
      val c =
        s"""cent$it AS (SELECT
           ${(0 until k).flatMap(j => xs.zipWithIndex.map { case (x, i) =>
          s"coalesce(sum(CASE WHEN cl = $j THEN $x END) / " +
            s"nullif(count(CASE WHEN cl = $j THEN 1 END), 0), " +
            s"max(c${j}_$i)) AS c${j}_$i" }).mkString(", ")}
           FROM a$it CROSS JOIN cent${it - 1})"""
      s"$a, $c"
    }.mkString(", ")
    s"""WITH $qCte, $cent0, $iterCtes
       SELECT id AS vec_id, $assignCase AS cluster
       FROM (SELECT q.*, ${(0 until k).map(j => s"${dist(j)} AS d$j")
      .mkString(", ")}
       FROM q CROSS JOIN cent$iters)"""
  }

  // ---- registration ------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmeans" -> ((s, d) =>
      Cluster.kMeans(t(s, d, "embeddings"), "vec_id", "embedding",
        KmK, KmIters, KmDims)),

    "q_kmeans_sizes" -> ((s, d) =>
      Cluster.kMeansSizes(t(s, d, "embeddings"), "vec_id", "embedding",
        KmK, KmIters, KmDims)),

    // per-cluster exemplars: the 5 most central members of each cluster
    // — bounded-heap selection, (dist ASC, id ASC) total order
    "q_kmeans_exemplars" -> ((s, d) =>
      Cluster.kMeansExemplars(t(s, d, "embeddings"), "vec_id", "embedding",
        KmK, KmIters, KmDims, topN = 5)),

    // mergeable HLL: distinct customers per month, sketched then estimated
    "q_hll" -> ((s, d) => {
      val o = t(s, d, "orders").withColumn("month",
        date_format(col("o_orderdate"), "yyyy-MM"))
      Sketches.approxDistinct(o, Seq("month"), "o_custkey")
    }),

    // the MERGE path: month registers rolled up to years WITHOUT touching
    // the raw orders again — the oracle sketches years directly (max is
    // associative, so the two must be identical)
    "q_hll_merge" -> ((s, d) => {
      val o = t(s, d, "orders").withColumn("month",
        date_format(col("o_orderdate"), "yyyy-MM"))
      val months = Sketches.hllSketch(o, Seq("month"), "o_custkey")
        .withColumn("year", substring(col("month"), 1, 4))
      Sketches.hllEstimate(Sketches.hllMerge(months, Seq("year")),
        Seq("year"))
    }),

    // boilerplate removal over the corpus's synthesized lines (same
    // " the " -> newline trick as q_dedup_lines)
    "q_boilerplate" -> ((s, d) =>
      graft.text.Dedup.removeBoilerplate(
        t(s, d, "documents").withColumn("text",
          regexp_replace(col("text"), " the ", "\n")),
        "text", "doc_id", minDocs = 2)),

    // subword tokenizer: fitted piece vocabulary + greedy longest-match
    // encoding (graft.functions.SubwordEncode, codegen'd)
    "q_subword_vocab" -> ((s, d) =>
      graft.text.Subword.fitVocab(t(s, d, "documents"), "text",
        size = 200, maxLen = 4)),
    "q_subword" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.text.Subword.encode(docs, "text", "doc_id",
        graft.text.Subword.fitVocab(docs, "text", size = 200, maxLen = 4),
        maxLen = 4)
    }),

    // materialized-aggregate maintenance: per-part quantity stats kept as
    // mergeable state, a delta batch folded in WITHOUT rescanning the
    // base — the oracle is the full recompute the merge must equal
    "q_agg_maintain" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_partkey"),
        col("l_quantity").cast("long").as("qty"), col("l_shipdate"))
      val cut = lit("1999-01-01").cast("timestamp")
      val R = graft.relational.Relational
      R.aggFinalize(R.aggMerge(
        R.aggState(li.filter(col("l_shipdate") < cut),
          Seq("l_partkey"), "qty"),
        R.aggState(li.filter(col("l_shipdate") >= cut),
          Seq("l_partkey"), "qty"),
        Seq("l_partkey")), Seq("l_partkey"))
    }),

    // CMS frequency sketch: month registers summed to years, then every
    // (year, customer) point-queried from the merged registers alone
    "q_cms_merge" -> ((s, d) => {
      val o = t(s, d, "orders").withColumn("month",
        date_format(col("o_orderdate"), "yyyy-MM"))
      val months = Sketches.cmsSketch(o, Seq("month"), "o_custkey")
        .withColumn("year", substring(col("month"), 1, 4))
      val probes = o.withColumn("year", substring(col("month"), 1, 4))
        .select("year", "o_custkey").distinct()
      Sketches.cmsEstimate(Sketches.cmsMerge(months, Seq("year")),
        probes, Seq("year"), "o_custkey")
    }),

    // mergeable heavy-hitter registers: daily top-user sketches per event
    // type, n-way-merged to the whole period, read with lo/hi bounds —
    // the oracle replays sketch, floors, merge, and re-truncation exactly
    "q_hh_merge" -> ((s, d) => {
      val e = t(s, d, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      val daily = Sketches.hhSketch(e, Seq("event_type", "day"),
        "user_id", k = 8)
      Sketches.hhTopK(
        Sketches.hhMerge(daily.drop("day"), Seq("event_type"), k = 8),
        Seq("event_type"))
    }),

    // market-basket mining: brand co-occurrence within orders, with
    // support/confidence/lift for pairs in >= 20 baskets
    "q_basket" -> ((s, d) =>
      graft.relational.Relational.marketBasketPairs(
        t(s, d, "lineitem")
          .join(t(s, d, "part").select("p_partkey", "p_brand"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand")),
        "l_orderkey", "p_brand", minPairCount = 20L)),

    // deterministic PII pseudonymization: names become salted-md5 tokens
    // that stay joinable; the mapping relation lives separately
    "q_pseudonymize" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        graft.text.Corpus.pseudonymize(col("c_name"), "c_name", "s1")
          .as("name_token"),
        col("c_mktsegment"))),

    // AMS/CMS join-size estimation: the F2 self-join moment of the
    // lineitem part-key distribution from registers alone — pricing a
    // join (and catching skew) without running it
    "q_cms_joinsize" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(lit("all").as("g"), col("l_partkey"))
      // materialize the registers ONCE (round 10, guide §2.4): regA and
      // regB are the same relation, but without the checkpoint the
      // planner builds it twice — two full corpus scans, each exploding
      // d=4× with an md5 per row (the before-plan's duplicated subtree
      // under the self-join). The register relation is ≤ d·w = 262144
      // rows — checkpoint-sized by construction.
      val reg = Sketches.cmsSketch(li, Seq("g"), "l_partkey",
        d = 4, w = 65536).localCheckpoint(true)
      Sketches.cmsJoinSize(reg, reg, Seq("g"))
    }),

    // Bloom membership: month bit-sets OR-merged to years, then every
    // (year, customer) probed — order-customers must read true (no false
    // negatives), no-order customers read the deterministic FP pattern
    "q_bloom_merge" -> ((s, d) => {
      val o = t(s, d, "orders").withColumn("month",
        date_format(col("o_orderdate"), "yyyy-MM"))
      val months = Sketches.bloomSketch(o, Seq("month"), "o_custkey")
        .withColumn("year", substring(col("month"), 1, 4))
      val probes = o.select(substring(col("month"), 1, 4).as("year"))
        .distinct()
        .crossJoin(t(s, d, "customer").select(col("c_custkey")))
      Sketches.bloomContains(Sketches.bloomMerge(months, Seq("year")),
        probes, Seq("year"), "c_custkey")
    }),

    // integer-deterministic PageRank on the event transition graph
    "q_pagerank" -> ((s, d) =>
      graft.relational.Graph.pageRank(
        graft.relational.Relational.transitions(
          DataQueries.readEventsMicros(s, d),
          Seq("user_id"), "tsu", "event_type", Seq("event_id")),
        "from_type", "to_type", "n", iters = PrIters)),

    // TextRank (Mihalcea & Tarau 2004): PageRank over the undirected
    // word co-occurrence (bigram) graph — corpus keyword ranking
    "q_textrank" -> ((s, d) =>
      graft.relational.Graph.pageRank(wordEdges(s, d), "a", "b", "w",
        iters = PrIters)),

    // exact triangle count of the same word graph (degree-oriented
    // wedge join — hub words cannot blow up the self-join)
    "q_triangles" -> ((s, d) =>
      graft.relational.Graph.triangleCount(wordEdges(s, d), "a", "b")),

    // fitted n-gram language-ID: per-language top-64 character-trigram
    // profiles (count DESC, gram ASC tie-break). The fit is SHARED across
    // the family via langidProfile (fit once, classify many — VERDICT
    // r7 #6: the three queries re-fit identical profiles back to back,
    // ~20 s/iteration of pure duplicate trigram explodes)
    "q_langid_profile" -> ((s, d) => langidProfile(s, d)),

    // classify the corpus against its own fitted profiles and flag
    // agreement with the upstream lang tag — integer overlap scores,
    // total tie-break order, so the prediction is exactly replayable
    "q_langid" -> ((s, d) =>
      graft.text.LangId.selfCheckWith(t(s, d, "documents"), "doc_id",
        "text", "lang", langidProfile(s, d), n = 3)),

    // forced-path twin: maxLiteralEntries = 0 pushes the classify onto
    // the explode + broadcast-join + argmax path a too-large-to-inline
    // profile would take at 100 TB — same oracle as q_langid
    "q_langid_join" -> ((s, d) =>
      graft.text.LangId.selfCheckWith(t(s, d, "documents"), "doc_id",
        "text", "lang", langidProfile(s, d), n = 3,
        maxLiteralEntries = 0)),

    // mergeable quantile sketch: per-returnflag price quantiles from
    // binned-ECDF registers (integer rank targets — exact bin pick)
    "q_qsketch" -> ((s, d) =>
      Sketches.qQuantile(
        Sketches.qSketch(t(s, d, "lineitem"), Seq("l_returnflag"),
          "l_extendedprice", lo = 0.0, hi = 110000.0),
        Seq("l_returnflag"), QsQuantiles, lo = 0.0, hi = 110000.0)),

    // the MERGE path: month registers of order totals summed to years,
    // then the median read from merged registers alone — counter sum is
    // associative, so the oracle sketches years directly
    "q_qsketch_merge" -> ((s, d) => {
      val o = t(s, d, "orders").withColumn("month",
        date_format(col("o_orderdate"), "yyyy-MM"))
      val months = Sketches.qSketch(o, Seq("month"), "o_totalprice",
        lo = 0.0, hi = 500000.0)
        .withColumn("year", substring(col("month"), 1, 4))
      Sketches.qQuantile(Sketches.qMerge(months, Seq("year")),
        Seq("year"), Seq((1, 2)), lo = 0.0, hi = 500000.0)
    }),

    // interval union: per-user event spans (value x 100 s — long enough
    // that spans genuinely nest and chain) merged to maximal covered
    // intervals; exact integral-microsecond endpoints
    "q_interval_merge" -> ((s, d) =>
      graft.relational.Relational.mergeIntervals(
        eventIntervals(s, d), Seq("user_id"), "s", "en")),

    // per-user coverage totals read from the merged spans
    "q_interval_cover" -> ((s, d) =>
      graft.relational.Relational.intervalCoverage(
        eventIntervals(s, d), Seq("user_id"), "s", "en")),

    // SCD2 dimension build: per-user event-type state versions with
    // [valid_from, valid_to) in exact integral micros; no-op entries
    // never open a version
    "q_scd2" -> ((s, d) =>
      graft.relational.Relational.scd2(
        DataQueries.readEventsMicros(s, d)
          .select("user_id", "tsu", "event_id", "event_type"),
        Seq("user_id"), "tsu", Seq("event_type"), Seq("event_id"))),

    // point-in-time join against the SCD2 dimension: each event's user
    // state 30 minutes later (facts shifted +1800 s, renamed t)
    "q_pit_join" -> ((s, d) => {
      val ev = DataQueries.readEventsMicros(s, d)
      val dim = graft.relational.Relational.scd2(
        ev.select("user_id", "tsu", "event_id", "event_type"),
        Seq("user_id"), "tsu", Seq("event_type"), Seq("event_id"))
        .withColumnRenamed("event_type", "state")
      val facts = ev.select(col("event_id"), col("user_id"),
        (col("tsu") + lit(1800000000L)).as("t"))
      graft.relational.Relational.pitJoin(facts, dim, Seq("user_id"),
        "t", Seq("state"), validFrom = "valid_from",
        validTo = "valid_to")
    }),

    // HLL set algebra: distinct customers active in BOTH 1996 and 1997
    // per priority, from two register relations alone (union = max-merge,
    // intersection = inclusion-exclusion, clamped at 0)
    "q_hll_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      def reg(yr: Int) = Sketches.hllSketch(
        o.filter(year(col("o_orderdate")) === yr)
          .select("o_orderpriority", "o_custkey"),
        Seq("o_orderpriority"), "o_custkey")
      Sketches.hllIntersect(reg(1996), reg(1997), Seq("o_orderpriority"))
    }),

    // multi-source BFS over the customer-part co-purchase bipartite
    // graph: hop distances from one nation's customers (hop 1 = their
    // parts, hop 2 = co-purchasing customers, ... — the collaborative-
    // filtering reach computation); integer hop counts, frontier rounds
    "q_bfs" -> ((s, d) => {
      val cp = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("p"), col("l_partkey")).as("p")).distinct()
      val edges = cp.select(col("c").as("src"), col("p").as("dst"))
        .union(cp.select(col("p").as("src"), col("c").as("dst")))
      val sources = t(s, d, "customer")
        .filter(col("c_nationkey") === 0)
        .select(concat(lit("c"), col("c_custkey")).as("node"))
      graft.relational.Graph.shortestPaths(edges, "src", "dst",
        sources, maxHops = BfsHops)
    }),

    // grouped OLS: price ~ quantity per (returnflag, linestatus), fitted
    // in ONE moment-aggregate pass (SQL-standard regr_* on both engines)
    "q_regression" -> ((s, d) =>
      graft.relational.Analytics.groupedOls(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        "l_quantity", "l_extendedprice")),

    // categorical association: is a document's language independent of
    // its source? Full-table chi-squared + mutual information from the
    // observed cells only
    "q_assoc" -> ((s, d) =>
      graft.relational.Analytics.association(t(s, d, "documents"),
        "lang", "source")),

    // first-/last-touch conversion attribution over the event log:
    // which channel preceded each purchase
    "q_attribution" -> ((s, d) =>
      graft.relational.Analytics.attribution(
        DataQueries.readEventsMicros(s, d),
        "user_id", "tsu", "event_id", "event_type", "value", "purchase")),

    // incremental join maintenance: a maintained orders x customer join
    // absorbs insert batches on BOTH sides via delta joins; the oracle
    // is the full recompute the maintained view must equal
    "q_join_maintain" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").select("c_custkey", "c_name")
      val oOld = o.filter(col("o_orderkey") % 7 =!= 0)
      val oNew = o.filter(col("o_orderkey") % 7 === 0)
      val cOld = c.filter(col("c_custkey") % 11 =!= 0)
      val cNew = c.filter(col("c_custkey") % 11 === 0)
      val base = oOld.join(cOld, oOld("o_custkey") === cOld("c_custkey"))
      val delta = graft.relational.Analytics.joinDelta(
        oOld, oNew, cOld, cNew, Seq("o_custkey"), Seq("c_custkey"))
      base.unionByName(delta)
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
    }),

    // Pareto frontier per brand: parts not dominated on
    // (size max, retail price min)
    "q_skyline" -> ((s, d) =>
      graft.relational.Analytics.skyline2(
        t(s, d, "part").withColumn("neg_price", -col("p_retailprice")),
        Seq("p_brand"), "p_size", "neg_price")
        .select("p_brand", "p_partkey", "p_size", "p_retailprice")),

    // pairwise source-overlap matrix: which corpus slices duplicate each
    // other, as distinct-5-gram Jaccard/containment (all pairs, zero
    // overlap included)
    "q_source_overlap" -> ((s, d) =>
      graft.text.Dedup.sourceOverlap(t(s, d, "documents"), "text",
        "source", shingleK = 5)),

    // functional-dependency audit: languages whose docs span multiple
    // sources (lang -/-> source) — empty would mean lang determines
    // source
    "q_fd" -> ((s, d) =>
      graft.relational.Analytics.fdViolations(t(s, d, "documents"),
        Seq("lang"), "source")),

    // top user journeys: 30-minute gap sessions rendered as ->-paths,
    // capped at 5 steps, top-20 by session count
    "q_paths" -> ((s, d) =>
      graft.relational.Analytics.topSessionPaths(
        DataQueries.readEventsMicros(s, d),
        "user_id", "tsu", "event_id", "event_type",
        gapUs = PathGapUs, maxSteps = PathSteps, topN = PathTopN)),

    // drift gate: PSI of order totals, 1996 reference vs 1997 current,
    // over fixed price-band edges
    "q_psi" -> ((s, d) => {
      val o = t(s, d, "orders")
      def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
      graft.relational.Analytics.psi(yr(1996), yr(1997), "o_totalprice",
        PsiEdges)
    }),

    // weighted quantiles from registers: quantity-weighted price
    // quantiles per returnflag — same bin geometry as q_qsketch, the
    // counters carry weight mass
    "q_qsketch_weighted" -> ((s, d) =>
      Sketches.qQuantile(
        Sketches.qSketchWeighted(t(s, d, "lineitem"), Seq("l_returnflag"),
          "l_extendedprice", "l_quantity", lo = 0.0, hi = 110000.0),
        Seq("l_returnflag"), QsQuantiles, lo = 0.0, hi = 110000.0)),

    // recency-decayed activity score after every event (α=1/2, last 4):
    // power-of-two weights make the fold bit-exact in any engine
    "q_decay" -> ((s, d) =>
      graft.relational.Analytics.decayedValue(
        DataQueries.readEventsMicros(s, d),
        Seq("user_id"), "tsu", "event_id", "value", "decayed",
        alpha = DecayAlpha, lastN = DecayN)
        .select("event_id", "user_id", "decayed")),

    // funnel with a 2-hour per-step conversion window: stale journeys
    // the unbounded q_funnel counts are nulled here
    "q_funnel_within" -> ((s, d) =>
      graft.relational.Analytics.funnelWithin(
        DataQueries.readEventsMicros(s, d).withColumn("o", col("tsu")),
        "user_id", "o", "event_type", Seq("view", "click", "purchase"),
        windowUs = FunnelWindowUs)),

    // cohort revenue (LTV) curve: value per (cohort day, offset) with
    // the running cumulative per cohort
    "q_ltv" -> ((s, d) =>
      graft.relational.Analytics.cohortValue(
        DataQueries.readEventsMicros(s, d)
          .withColumn("day", expr("tsu div 86400000000")),
        "user_id", "day", "value")),

    // per-source corpus health report: volume, language spread, length,
    // and the exact-duplicate rate — the curation dashboard row
    "q_source_report" -> ((s, d) =>
      t(s, d, "documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(lit(1.0) - countDistinct(col("text")).cast("double") /
            count(lit(1)).cast("double"), 6).as("dup_rate"))),

    // corpus repetitiveness per source: distinct-1/2/3-gram ratios, the
    // portable-md5 oracle variant (the default is structural xxhash64 —
    // same ratios, asserted in CorpusSpec) — one scan explodes every n
    "q_ngram_diversity" -> ((s, d) =>
      graft.text.Corpus.ngramDiversity(t(s, d, "documents"), "text",
        "source", portableHash = true)),

    // feature selection: MI of every listed categorical feature against
    // the order year, ranked in ONE corpus pass
    "q_mi_ranking" -> ((s, d) =>
      graft.relational.Analytics.miRanking(
        t(s, d, "orders").filter(col("o_orderdate").isNotNull)
          .withColumn("yr", year(col("o_orderdate"))),
        MiFeatures, "yr")),

    // entity resolution: fuzzy-join customer names against a corrupted
    // clone (10th character dropped) — FastSS candidates + exact verify,
    // equal to the brute-force cross-product filter the oracle runs
    "q_fuzzy_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val corrupted = c.select(concat(substring(col("c_name"), 1, 9),
        col("c_name").substr(lit(11), length(col("c_name"))))
        .as("corrupted"))
      graft.relational.Relational.fuzzyJoin(
        c.select("c_name"), corrupted, "c_name", "corrupted",
        maxDist = 1)
    }),

    // categorical drift: priority-mix PSI between 1996 and 1997 orders
    "q_psi_cat" -> ((s, d) => {
      val o = t(s, d, "orders")
      def yr(y: Int) = o.filter(year(col("o_orderdate")) === y)
      graft.relational.Analytics.psiCategorical(yr(1996), yr(1997),
        "o_orderpriority")
    }),

    // KS drift from archived quantile registers alone: per priority,
    // max ECDF gap between 1996 and 1997 order totals at bin edges —
    // zero corpus rescans once the registers exist
    "q_ks" -> ((s, d) => {
      val o = t(s, d, "orders")
      def reg(y: Int) = Sketches.qSketch(
        o.filter(year(col("o_orderdate")) === y),
        Seq("o_orderpriority"), "o_totalprice", lo = KsLo, hi = KsHi)
      graft.relational.Analytics.ksFromRegisters(reg(1996), reg(1997),
        Seq("o_orderpriority"))
    }),

    // k-core of the customer-part co-purchase graph: synchronous
    // peeling to the subgraph where every node keeps >= k co-purchase
    // partners — the dense-collaboration extraction
    "q_kcore" -> ((s, d) => {
      val cp = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("p"), col("l_partkey")).as("p"))
      graft.relational.Graph.kCore(cp, "c", "p", k = KcK,
        maxRounds = KcRounds)
    }),

    // rolling 7-day distinct users per day, from the daily HLL register
    // relation alone — the corpus is scanned once for the daily
    // sketches and never again
    "q_hll_rolling" -> ((s, d) => {
      val e = DataQueries.readEventsMicros(s, d)
        .withColumn("day", expr("tsu div 86400000000"))
      Sketches.hllEstimate(
        Sketches.hllRolling(
          Sketches.hllSketch(e, Seq("day"), "user_id"),
          "day", window = RollWindow),
        Seq("day"))
    })
  )

  private val PathGapUs = 1800000000L // 30 min
  private val PathSteps = 5
  private val PathTopN = 20
  private val PsiEdges = Seq(50000.0, 100000.0, 150000.0, 200000.0,
    250000.0)
  private val DecayAlpha = 0.5
  private val DecayN = 4
  private val FunnelWindowUs = 7200000000L // 2 h
  private val RollWindow = 7
  private val KcK = 8
  private val KcRounds = 6
  private val KsLo = 0.0
  private val KsHi = 500000.0
  private val KsBins = 4096
  private val MiFeatures = Seq("o_orderpriority", "o_orderstatus")

  /** MI-ranking oracle generated from the same feature list: one block
    * per feature, UNION ALL — each block replays the cells/marginals/
    * total formula the Spark side computes in one melted pass. */
  private def miRankingSql(features: Seq[String]): String =
    features.map { f =>
      s"""SELECT '$f' AS feature, CAST(max(n) AS BIGINT) AS n,
           round(sum(o / CAST(n AS DOUBLE)
             * ln(o * CAST(n AS DOUBLE) / (ra * cb))), 6) AS mi
         FROM (
           WITH src AS (SELECT CAST($f AS VARCHAR) AS v,
               strftime(o_orderdate, '%Y') AS lbl FROM orders
               WHERE $f IS NOT NULL AND o_orderdate IS NOT NULL),
           c AS (SELECT v, lbl, count(*) AS o FROM src GROUP BY 1, 2),
           r AS (SELECT v, sum(o) AS ra FROM c GROUP BY 1),
           l AS (SELECT lbl, sum(o) AS cb FROM c GROUP BY 1),
           t AS (SELECT sum(o) AS n FROM c)
           SELECT c.o, r.ra, l.cb, t.n FROM c JOIN r USING (v)
             JOIN l USING (lbl) CROSS JOIN t)"""
    }.mkString("\nUNION ALL\n")

  /** KS oracle from the same register geometry: two reg CTEs, cumulative
    * fractions at bin edges, max absolute gap — integer counters and
    * single divisions, no rounding. */
  private def ksSql(refCte: String, curCte: String, grpName: String,
      lo: Double, hi: Double, bins: Int): String = {
    def reg(src: String, name: String, cnt: String) =
      s"""$name AS (SELECT grp,
           least(greatest(CAST(floor((CAST(v AS DOUBLE) - ($lo))
             / (${hi - lo}) * $bins) AS BIGINT), 0),
             ${bins - 1}) AS bin,
           count(*) AS $cnt
         FROM ($src) WHERE v IS NOT NULL GROUP BY 1, 2)"""
    s"""WITH ${reg(refCte, "ra", "ca")},
       ${reg(curCte, "rb", "cb")},
       j AS (SELECT coalesce(ra.grp, rb.grp) AS grp,
               coalesce(ra.bin, rb.bin) AS bin,
               coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
             FROM ra FULL JOIN rb
               ON ra.grp = rb.grp AND ra.bin = rb.bin),
       c AS (SELECT grp, bin,
               CAST(sum(ca) OVER (PARTITION BY grp ORDER BY bin)
                 AS DOUBLE) / sum(ca) OVER (PARTITION BY grp) AS da,
               CAST(sum(cb) OVER (PARTITION BY grp ORDER BY bin)
                 AS DOUBLE) / sum(cb) OVER (PARTITION BY grp) AS db
             FROM j)
       SELECT grp AS $grpName, max(abs(da - db)) AS ks
       FROM c GROUP BY 1"""
  }

  /** Decay oracle generated from the same (alpha, lastN) constants:
    * power-of-two weights ⇒ exact products, fixed fold order ⇒ the sum
    * replays bit-for-bit — no rounding anywhere. */
  private def decaySql(alpha: Double, lastN: Int): String = {
    val terms = (0 until lastN).map { j =>
      val src = if (j == 0) "value" else s"lag(value, $j) OVER w"
      s"coalesce($src, 0.0) * ${alpha * math.pow(1 - alpha, j)}"
    }.mkString(" + ")
    s"""SELECT event_id, user_id, $terms AS decayed
       FROM events
       WINDOW w AS (PARTITION BY user_id
         ORDER BY epoch_us(ts), event_id)"""
  }

  /** PSI oracle generated from the same edges/smoothing constants the
    * Spark side runs with (repo pattern: iterative/parameterized ops get
    * generated oracles so the two sides cannot drift). */
  private def psiSql(refCte: String, curCte: String,
      edges: Seq[Double]): String = {
    val nb = edges.size + 1
    val binExpr = edges
      .map(e => s"(CASE WHEN v >= $e THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH refv AS ($refCte), curv AS ($curCte),
       rb AS (SELECT $binExpr AS bin, count(*) AS cr
              FROM refv WHERE v IS NOT NULL GROUP BY 1),
       cb AS (SELECT $binExpr AS bin, count(*) AS cc
              FROM curv WHERE v IS NOT NULL GROUP BY 1),
       j AS (SELECT coalesce(rb.cr, 0) AS cr, coalesce(cb.cc, 0) AS cc
             FROM rb FULL JOIN cb ON rb.bin = cb.bin),
       t AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM j)
       SELECT CAST(t.nr AS BIGINT) AS n_ref, CAST(t.nc AS BIGINT) AS n_cur,
         round(sum(
           ((cr + 0.5) / (t.nr + 0.5 * $nb) -
            (cc + 0.5) / (t.nc + 0.5 * $nb)) *
           ln(((cr + 0.5) / (t.nr + 0.5 * $nb)) /
              ((cc + 0.5) / (t.nc + 0.5 * $nb)))), 6) AS psi
       FROM j CROSS JOIN t GROUP BY 1, 2"""
  }

  private val BfsHops = 3

  /** Per-user [start, end] spans from the event stream: start = the
    * event's microsecond timestamp, duration = value x 100 s (floored to
    * exact integral micros). */
  private def eventIntervals(s: SparkSession, d: String): DataFrame =
    DataQueries.readEventsMicros(s, d).select(col("user_id"),
      col("tsu").as("s"),
      (col("tsu") + floor(col("value") * 100000000L).cast("long"))
        .as("en"))

  private val QsQuantiles = Seq((1, 4), (1, 2), (3, 4), (99, 100))

  /** Undirected word co-occurrence (bigram) edges with counts — the
    * input relation for q_textrank and q_triangles. */
  private def wordEdges(s: SparkSession, d: String): DataFrame = {
    val toks = filter(graft.text.TextFunctions
      .tokensLower(coalesce(col("text"), lit(""))), w => w =!= "")
    val bg = t(s, d, "documents").select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("a"),
          element_at(col("__t"), i + 1).as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
    bg.union(bg.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
  }

  private val PrIters = 5

  private val TransitionEdgesSql =
    """SELECT from_type AS src, to_type AS dst, count(*) AS w FROM (
         SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS to_type
         FROM events)
       WHERE to_type IS NOT NULL GROUP BY 1, 2"""

  private val WordEdgesSql =
    """WITH t AS (SELECT list_filter(
           string_split_regex(trim(lower(coalesce(text, ''))), '\s+'),
           x -> x <> '') AS xs FROM documents),
         bg AS (SELECT xs[p] AS a, xs[p + 1] AS b FROM t,
                LATERAL (SELECT unnest(range(1, len(xs))) AS p)
                WHERE len(xs) >= 2),
         und AS (SELECT a, b FROM bg UNION ALL SELECT b, a FROM bg)
       SELECT a AS src, b AS dst, count(*) AS w FROM und
       WHERE a <> b GROUP BY 1, 2"""

  def oracleSql: Map[String, String] = {
    val km = kmeansSql(KmK, KmIters, KmDims)
    Map(
      "q_kmeans" -> km,
      "q_kmeans_sizes" ->
        s"SELECT cluster, count(*) AS n FROM ($km) GROUP BY cluster",
      "q_kmeans_exemplars" ->
        kmeansExemplarsSql(KmK, KmIters, KmDims, topN = 5),

      "q_hll" -> Sketches.estimateSql(
        """SELECT strftime(o_orderdate, '%Y-%m') AS grp,
             CAST(o_custkey AS VARCHAR) AS k FROM orders""", "month"),

      "q_hll_merge" -> Sketches.estimateSql(
        """SELECT strftime(o_orderdate, '%Y') AS grp,
             CAST(o_custkey AS VARCHAR) AS k FROM orders""", "year"),

      "q_hh_merge" -> Sketches.hhTopKSql(
        """SELECT event_type AS grp, strftime(ts, '%Y-%m-%d') AS sub,
             CAST(user_id AS VARCHAR) AS k FROM events""",
        "event_type", k = 8),

      "q_regression" ->
        """SELECT l_returnflag, l_linestatus,
             CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
             round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
             round(regr_intercept(l_extendedprice, l_quantity), 6)
               AS intercept,
             round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
           FROM lineitem GROUP BY 1, 2""",

      "q_assoc" ->
        """WITH cells AS (
             SELECT lang AS a, source AS b, count(*) AS o FROM documents
             WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
           rt AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
           ct AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
           tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
           parts AS (
             SELECT n,
               (o - ra * cb / CAST(n AS DOUBLE))
                 * (o - ra * cb / CAST(n AS DOUBLE))
                 / (ra * cb / CAST(n AS DOUBLE))
                 - ra * cb / CAST(n AS DOUBLE) AS chi_part,
               o / CAST(n AS DOUBLE)
                 * ln(o * CAST(n AS DOUBLE) / (ra * cb)) AS mi_part
             FROM cells JOIN rt USING (a) JOIN ct USING (b)
               CROSS JOIN tot),
           dof AS (SELECT (count(DISTINCT a) - 1)
                     * (count(DISTINCT b) - 1) AS dof FROM cells)
           SELECT max(n) AS n, count(*) AS cells, max(dof.dof) AS dof,
             round(max(n) + sum(chi_part), 6) AS chi2,
             round(sum(mi_part), 6) AS mi
           FROM parts CROSS JOIN dof""",

      "q_attribution" ->
        """WITH e AS (
             SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS o, event_id,
               event_type AS t, value AS v
             FROM events),
           w AS (
             SELECT t, v,
               last_value(CASE WHEN t <> 'purchase' THEN t END
                 IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY o, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
               first_value(CASE WHEN t <> 'purchase' THEN t END
                 IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY o, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft
             FROM e),
           conv AS (SELECT * FROM w WHERE t = 'purchase'
             AND lt IS NOT NULL),
           x AS (SELECT lt AS channel, 'last' AS model, v FROM conv
             UNION ALL
             SELECT ft, 'first', v FROM conv)
           SELECT channel, model, count(*) AS conversions,
             round(sum(v), 6) AS value
           FROM x GROUP BY 1, 2""",

      "q_join_maintain" ->
        """SELECT o_orderkey, o_custkey, c_name, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey""",

      "q_skyline" ->
        """SELECT p_brand, p_partkey, p_size, p_retailprice FROM part p
           WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
             AND NOT EXISTS (
               SELECT 1 FROM part q
               WHERE q.p_brand = p.p_brand
                 AND q.p_size >= p.p_size
                 AND q.p_retailprice <= p.p_retailprice
                 AND (q.p_size > p.p_size
                   OR q.p_retailprice < p.p_retailprice))""",

      "q_source_overlap" ->
        """WITH gr AS (
             SELECT source,
               unnest(list_distinct(list_transform(
                 range(1, len(ws) - 3),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4]))) AS gram
             FROM (SELECT source,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS ws
                   FROM documents WHERE source IS NOT NULL)),
           g AS (SELECT DISTINCT source, gram FROM gr),
           n AS (SELECT source, count(*) AS n FROM g GROUP BY 1),
           s AS (SELECT a.source AS src_a, b.source AS src_b,
                   count(*) AS shared
                 FROM g a JOIN g b
                   ON a.gram = b.gram AND a.source < b.source
                 GROUP BY 1, 2)
           SELECT na.source AS src_a, nb.source AS src_b,
             na.n AS n_grams_a, nb.n AS n_grams_b,
             CAST(coalesce(s.shared, 0) AS BIGINT) AS shared_grams,
             CAST(coalesce(s.shared, 0) AS DOUBLE)
               / (na.n + nb.n - coalesce(s.shared, 0)) AS jaccard,
             CAST(coalesce(s.shared, 0) AS DOUBLE)
               / least(na.n, nb.n) AS containment
           FROM n na
           JOIN n nb ON na.source < nb.source
           LEFT JOIN s ON s.src_a = na.source AND s.src_b = nb.source""",

      "q_fd" ->
        """SELECT lang, count(DISTINCT source) AS n_dep_values,
             count(*) AS n_rows
           FROM documents GROUP BY lang
           HAVING count(DISTINCT source) > 1""",

      "q_paths" ->
        s"""WITH e AS (
             SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS o, event_id,
               event_type AS t
             FROM events),
           s AS (
             SELECT user_id, o, event_id, t,
               CASE WHEN lag(o) OVER w IS NULL
                 OR o - lag(o) OVER w > $PathGapUs THEN 1 ELSE 0 END AS ns
             FROM e WINDOW w AS (PARTITION BY user_id
               ORDER BY o, event_id)),
           s2 AS (
             SELECT *, sum(ns) OVER (PARTITION BY user_id
               ORDER BY o, event_id ROWS UNBOUNDED PRECEDING) AS sid
             FROM s),
           p AS (
             SELECT user_id, sid,
               array_to_string(list_slice(
                 list(t ORDER BY o, event_id), 1, $PathSteps),
                 '->') AS path
             FROM s2 GROUP BY 1, 2),
           c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY 1)
           SELECT path, n_sessions FROM c
           ORDER BY n_sessions DESC, path LIMIT $PathTopN""",

      "q_psi" -> psiSql(
        """SELECT o_totalprice AS v FROM orders
           WHERE strftime(o_orderdate, '%Y') = '1996'""",
        """SELECT o_totalprice AS v FROM orders
           WHERE strftime(o_orderdate, '%Y') = '1997'""",
        PsiEdges),

      "q_qsketch_weighted" -> Sketches.qQuantileWeightedSql(
        """SELECT l_returnflag AS grp, l_extendedprice AS v,
             l_quantity AS w FROM lineitem""",
        "l_returnflag", QsQuantiles, lo = 0.0, hi = 110000.0),

      "q_decay" -> decaySql(DecayAlpha, DecayN),

      // each event feeds the RollWindow windows its day contributes to;
      // the whole estimator chain then replays per window. Labels past
      // the max observed day are phantom partial windows — filtered on
      // both sides (hllRolling's right-edge rule, ADVICE r6)
      "q_hll_rolling" -> Sketches.estimateSql(
        s"""SELECT (CAST(epoch_us(ts) AS BIGINT) // 86400000000) + off.o
               AS grp,
             CAST(user_id AS VARCHAR) AS k
           FROM events CROSS JOIN
             (SELECT unnest(range(0, $RollWindow)) AS o) off
           WHERE (CAST(epoch_us(ts) AS BIGINT) // 86400000000) + off.o <=
             (SELECT max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)
              FROM events)""",
        "day"),

      "q_funnel_within" ->
        s"""WITH e AS (
             SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS o,
               event_type AS t
             FROM events),
           s1 AS (
             SELECT user_id, min(o) AS step_1 FROM e
             WHERE t = 'view' GROUP BY 1),
           s2 AS (
             SELECT s1.user_id, s1.step_1,
               min(CASE WHEN e.o > s1.step_1
                 AND e.o <= s1.step_1 + $FunnelWindowUs
                 THEN e.o END) AS step_2
             FROM s1 LEFT JOIN e
               ON e.user_id = s1.user_id AND e.t = 'click'
             GROUP BY 1, 2),
           s3 AS (
             SELECT s2.user_id, s2.step_1, s2.step_2,
               min(CASE WHEN e.o > s2.step_2
                 AND e.o <= s2.step_2 + $FunnelWindowUs
                 THEN e.o END) AS step_3
             FROM s2 LEFT JOIN e
               ON e.user_id = s2.user_id AND e.t = 'purchase'
             GROUP BY 1, 2, 3)
           SELECT user_id, step_1, step_2, step_3 FROM s3""",

      "q_boilerplate" ->
        """WITH src AS (
             SELECT doc_id, regexp_replace(text, ' the ', chr(10), 'g') AS t
             FROM documents),
           ls AS (SELECT doc_id, string_split(t, chr(10)) AS xs FROM src),
           l AS (SELECT doc_id, xs[p] AS line, p
                 FROM ls, LATERAL (SELECT unnest(range(1, len(xs) + 1)) AS p)),
           bp AS (SELECT trim(line) AS k FROM l WHERE trim(line) <> ''
                  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
           kept AS (SELECT doc_id, line, p FROM l
                    WHERE trim(line) = ''
                       OR trim(line) NOT IN (SELECT k FROM bp)),
           re AS (SELECT doc_id,
                    string_agg(line, chr(10) ORDER BY p) AS clean_text,
                    count(*) AS kept_n
                  FROM kept GROUP BY doc_id)
           SELECT ls.doc_id, coalesce(re.clean_text, '') AS clean_text,
             len(ls.xs)::BIGINT AS n_lines,
             (len(ls.xs) - coalesce(re.kept_n, 0))::BIGINT AS n_removed
           FROM ls LEFT JOIN re ON ls.doc_id = re.doc_id""",

      "q_subword_vocab" ->
        s"""WITH w AS (
              SELECT xs[p] AS word
              FROM (SELECT list_filter(
                      string_split_regex(trim(lower(coalesce(text, ''))),
                        '\\s+'), x -> x <> '') AS xs FROM documents),
                LATERAL (SELECT unnest(range(1, len(xs) + 1)) AS p)),
            grams AS (
              SELECT substr(word, s, l) AS piece, count(*) AS n_occurrences
              FROM w,
                LATERAL (SELECT unnest(range(1, len(word) + 1)) AS s),
                LATERAL (SELECT unnest(
                  range(1, least(4, len(word) - s + 1) + 1)) AS l)
              GROUP BY 1),
            top AS (SELECT piece, n_occurrences FROM grams
                    ORDER BY n_occurrences DESC, piece LIMIT 200)
            SELECT piece,
              (row_number() OVER (ORDER BY n_occurrences DESC, piece) - 1)
                ::BIGINT AS piece_id,
              n_occurrences
            FROM top""",

      "q_subword" ->
        s"""WITH RECURSIVE
            toks AS (
              SELECT doc_id, list_filter(
                string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
                x -> x <> '') AS xs
              FROM documents),
            w AS (SELECT doc_id, p AS wi, xs[p] AS word FROM toks,
                  LATERAL (SELECT unnest(range(1, len(xs) + 1)) AS p)),
            grams AS (
              SELECT substr(word, s, l) AS piece, count(*) AS n
              FROM w,
                LATERAL (SELECT unnest(range(1, len(word) + 1)) AS s),
                LATERAL (SELECT unnest(
                  range(1, least(4, len(word) - s + 1) + 1)) AS l)
              GROUP BY 1),
            vocab AS (SELECT piece FROM grams
                      ORDER BY n DESC, piece LIMIT 200),
            dw AS (SELECT DISTINCT word FROM w),
            enc AS (
              SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS pieces,
                0 AS np, false AS unk
              FROM dw
              UNION ALL
              SELECT word,
                CASE WHEN bl IS NULL THEN len(word) + 1 ELSE pos + bl END,
                CASE WHEN bl IS NULL THEN '[UNK]'
                     WHEN pieces = '' THEN substr(word, pos, bl)
                     ELSE pieces || ' ' || substr(word, pos, bl) END,
                CASE WHEN bl IS NULL THEN 1 ELSE np + 1 END,
                bl IS NULL
              FROM (SELECT e.*,
                      (SELECT max(len(v.piece)) FROM vocab v
                       WHERE v.piece = substr(e.word, e.pos, len(v.piece)))
                        AS bl
                    FROM enc e
                    WHERE e.pos <= len(e.word) AND NOT e.unk) s),
            done AS (SELECT word, pieces, np, unk FROM enc
                     WHERE pos > len(word)),
            agg AS (
              SELECT w.doc_id, count(*)::BIGINT AS n_words,
                sum(d.np)::BIGINT AS n_pieces,
                sum(CASE WHEN d.unk THEN 1 ELSE 0 END)::BIGINT AS n_unk,
                string_agg(d.pieces, ' ' ORDER BY w.wi) AS encoded
              FROM w JOIN done d USING (word)
              GROUP BY 1)
            SELECT t.doc_id,
              coalesce(a.n_words, 0)::BIGINT AS n_words,
              coalesce(a.n_pieces, 0)::BIGINT AS n_pieces,
              coalesce(a.n_unk, 0)::BIGINT AS n_unk,
              coalesce(a.encoded, '') AS encoded
            FROM toks t LEFT JOIN agg a USING (doc_id)""",

      "q_agg_maintain" ->
        """SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(qty) AS BIGINT) AS sum_v,
             CAST(min(qty) AS BIGINT) AS min_v,
             CAST(max(qty) AS BIGINT) AS max_v,
             round(CAST(sum(qty) AS DOUBLE) / count(*), 6) AS avg_v
           FROM (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty
                 FROM lineitem WHERE l_quantity IS NOT NULL)
           GROUP BY 1""",

      "q_cms_merge" -> Sketches.cmsEstimateSql(
        """SELECT strftime(o_orderdate, '%Y') AS grp,
             CAST(o_custkey AS VARCHAR) AS k, o_custkey FROM orders""",
        "year", "o_custkey"),

      "q_basket" ->
        """WITH present AS (
             SELECT DISTINCT CAST(l.l_orderkey AS VARCHAR) AS b,
               p.p_brand AS i
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
           tot AS (SELECT count(DISTINCT b) AS n FROM present),
           items AS (SELECT i, count(*) AS ni FROM present GROUP BY 1),
           pairs AS (
             SELECT a.i AS item_a, bb.i AS item_b, count(*) AS n_ab
             FROM present a JOIN present bb ON a.b = bb.b AND a.i < bb.i
             GROUP BY 1, 2 HAVING count(*) >= 20)
           SELECT p.item_a, p.item_b, CAST(p.n_ab AS BIGINT) AS n_ab,
             round(CAST(p.n_ab AS DOUBLE) / t.n, 6) AS support,
             round(CAST(p.n_ab AS DOUBLE) / ia.ni, 6) AS conf_ab,
             round(CAST(p.n_ab AS DOUBLE) / ib.ni, 6) AS conf_ba,
             round(CAST(p.n_ab AS DOUBLE) * t.n /
               (ia.ni * CAST(ib.ni AS DOUBLE)), 6) AS lift
           FROM pairs p
           JOIN items ia ON ia.i = p.item_a
           JOIN items ib ON ib.i = p.item_b, tot t""",

      "q_pseudonymize" ->
        """SELECT c_custkey,
             't_' || substr(md5('s1:c_name:' || c_name), 1, 16)
               AS name_token,
             c_mktsegment
           FROM customer""",

      "q_cms_joinsize" -> Sketches.cmsJoinSizeSql(
        "SELECT 'all' AS grp, CAST(l_partkey AS VARCHAR) AS k FROM lineitem",
        "SELECT 'all' AS grp, CAST(l_partkey AS VARCHAR) AS k FROM lineitem",
        "g", d = 4, w = 65536),

      "q_bloom_merge" -> Sketches.bloomContainsSql(
        """SELECT strftime(o_orderdate, '%Y') AS grp,
             CAST(o_custkey AS VARCHAR) AS k FROM orders""",
        """SELECT y.grp, CAST(c.c_custkey AS VARCHAR) AS k, c.c_custkey
           FROM (SELECT DISTINCT strftime(o_orderdate, '%Y') AS grp
                 FROM orders) y, customer c""",
        "year", "c_custkey"),

      "q_pagerank" ->
        graft.relational.Graph.pageRankSql(TransitionEdgesSql, PrIters),

      "q_textrank" ->
        graft.relational.Graph.pageRankSql(WordEdgesSql, PrIters),

      // exact triangles via the canonical a<b<c three-way self-join —
      // orientation is a performance device, not a semantics one, so the
      // oracle needs no degree ordering
      "q_triangles" ->
        s"""WITH e0 AS ($WordEdgesSql),
            und AS (SELECT DISTINCT least(src, dst) AS a,
                      greatest(src, dst) AS b
                    FROM e0 WHERE src <> dst)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM und e1
            JOIN und e2 ON e1.b = e2.a
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b""",

      "q_langid_profile" ->
        s"""WITH $LangProfileSql
            SELECT lang, gram, rank FROM prof WHERE rank <= 64""",

      // the classifier replay: distinct doc trigrams joined to the
      // fitted profiles, integer overlap scores, (score DESC, lang ASC)
      // argmax, zero-overlap docs -> ('und', 0)
      "q_langid" -> LangIdSelfCheckSql,

      // the literal-intersect and join paths answer to the SAME replay
      "q_langid_join" -> LangIdSelfCheckSql,

      "q_qsketch" -> Sketches.qQuantileSql(
        "SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem",
        "l_returnflag", QsQuantiles, lo = 0.0, hi = 110000.0),

      "q_qsketch_merge" -> Sketches.qQuantileSql(
        """SELECT strftime(o_orderdate, '%Y') AS grp, o_totalprice AS v
           FROM orders""",
        "year", Seq((1, 2)), lo = 0.0, hi = 500000.0),

      "q_interval_merge" ->
        s"""WITH $IntervalSpansSql
            SELECT user_id, min(s) AS span_start, max(en) AS span_end,
              count(*) AS n_merged
            FROM sp GROUP BY user_id, span""",

      "q_interval_cover" ->
        s"""WITH $IntervalSpansSql,
            m2 AS (SELECT user_id, min(s) AS s, max(en) AS en
                   FROM sp GROUP BY user_id, span)
            SELECT user_id, CAST(sum(en - s) AS BIGINT) AS covered,
              count(*) AS n_spans
            FROM m2 GROUP BY 1""",

      "q_scd2" ->
        """WITH e AS (
             SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
             FROM events),
           c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY tsu, event_id) AS prev FROM e),
           ch AS (SELECT user_id, tsu, event_id, event_type FROM c
                  WHERE prev IS DISTINCT FROM event_type)
           SELECT user_id, event_type, tsu AS valid_from,
             lead(tsu) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id) AS valid_to
           FROM ch""",

      "q_pit_join" ->
        """WITH e AS (
             SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
             FROM events),
           c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY tsu, event_id) AS prev FROM e),
           dim AS (SELECT user_id, event_type AS state,
                     tsu AS valid_from
                   FROM c WHERE prev IS DISTINCT FROM event_type),
           f AS (SELECT event_id, user_id,
                   epoch_us(ts) + 1800000000 AS t FROM events)
           SELECT f.event_id, f.user_id, f.t, d.state
           FROM f ASOF LEFT JOIN dim d
             ON f.user_id = d.user_id AND f.t >= d.valid_from""",

      "q_hll_intersect" -> Sketches.hllIntersectSql(
        """SELECT o_orderpriority AS grp, CAST(o_custkey AS VARCHAR) AS k
           FROM orders WHERE year(o_orderdate) = 1996""",
        """SELECT o_orderpriority AS grp, CAST(o_custkey AS VARCHAR) AS k
           FROM orders WHERE year(o_orderdate) = 1997""",
        "o_orderpriority"),

      "q_mi_ranking" -> miRankingSql(MiFeatures),

      "q_ltv" ->
        """WITH e AS (
             SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               value
             FROM events),
           c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
           per AS (
             SELECT c.cohort, e.day - c.cohort AS "offset",
               round(sum(e.value), 6) AS value
             FROM e JOIN c USING (user_id) GROUP BY 1, 2)
           SELECT cohort, "offset", value,
             round(sum(value) OVER (PARTITION BY cohort
               ORDER BY "offset" ROWS UNBOUNDED PRECEDING), 6)
               AS cum_value
           FROM per""",

      "q_source_report" ->
        """SELECT source, count(*) AS n_docs,
             count(DISTINCT lang) AS n_langs,
             round(avg(n_chars), 6) AS avg_chars,
             round(1.0 - count(DISTINCT text) / CAST(count(*) AS DOUBLE),
               6) AS dup_rate
           FROM documents GROUP BY source""",

      "q_ngram_diversity" ->
        """WITH ws AS (
             SELECT source,
               regexp_split_to_array(trim(lower(text)), '\s+') AS w
             FROM documents WHERE text IS NOT NULL),
           g AS (
             SELECT source, n,
               CAST(('0x' || substr(md5(
                 array_to_string(w[i:i+n-1], ' ')), 1, 15)) AS BIGINT)
                 AS h
             FROM ws,
               (SELECT unnest([1, 2, 3]) AS n) nn,
               LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) pos
             WHERE i + n - 1 <= len(w))
           SELECT source, n, count(*) AS total,
             count(DISTINCT h) AS n_distinct,
             round(CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6)
               AS ratio
           FROM g GROUP BY source, n""",

      "q_fuzzy_join" ->
        """WITH l AS (SELECT DISTINCT c_name AS a FROM customer),
           r AS (SELECT DISTINCT
                   substring(c_name, 1, 9) || substring(c_name, 11) AS b
                 FROM customer)
           SELECT a, b, CAST(levenshtein(a, b) AS INTEGER) AS dist
           FROM l CROSS JOIN r
           WHERE levenshtein(a, b) <= 1""",

      "q_psi_cat" ->
        """WITH refc AS (
             SELECT CAST(o_orderpriority AS VARCHAR) AS c,
               count(*) AS cr
             FROM orders
             WHERE strftime(o_orderdate, '%Y') = '1996'
               AND o_orderpriority IS NOT NULL GROUP BY 1),
           curc AS (
             SELECT CAST(o_orderpriority AS VARCHAR) AS c,
               count(*) AS cc
             FROM orders
             WHERE strftime(o_orderdate, '%Y') = '1997'
               AND o_orderpriority IS NOT NULL GROUP BY 1),
           j AS (SELECT coalesce(cr, 0) AS cr, coalesce(cc, 0) AS cc
                 FROM refc FULL JOIN curc ON refc.c = curc.c),
           t AS (SELECT sum(cr) AS nr, sum(cc) AS nc, count(*) AS nb
                 FROM j)
           SELECT CAST(t.nr AS BIGINT) AS n_ref,
             CAST(t.nc AS BIGINT) AS n_cur,
             CAST(t.nb AS BIGINT) AS n_categories,
             round(sum(
               ((cr + 0.5) / (t.nr + 0.5 * t.nb) -
                (cc + 0.5) / (t.nc + 0.5 * t.nb)) *
               ln(((cr + 0.5) / (t.nr + 0.5 * t.nb)) /
                  ((cc + 0.5) / (t.nc + 0.5 * t.nb)))), 6) AS psi
           FROM j CROSS JOIN t GROUP BY 1, 2, 3""",

      "q_ks" -> ksSql(
        """SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders
           WHERE strftime(o_orderdate, '%Y') = '1996'""",
        """SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders
           WHERE strftime(o_orderdate, '%Y') = '1997'""",
        "o_orderpriority", lo = KsLo, hi = KsHi, bins = KsBins),

      "q_kcore" -> graft.relational.Graph.kCoreSql(
        """SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
             'p' || CAST(l.l_partkey AS VARCHAR) AS dst
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
        k = KcK, maxRounds = KcRounds),

      "q_bfs" -> graft.relational.Graph.shortestPathsSql(
        """SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
             'p' || CAST(l.l_partkey AS VARCHAR) AS dst
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           UNION ALL
           SELECT 'p' || CAST(l.l_partkey AS VARCHAR),
             'c' || CAST(o.o_custkey AS VARCHAR)
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
        """SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node
           FROM customer WHERE c_nationkey = 0""",
        maxHops = BfsHops)
    )
  }

  /** Shared sweep CTEs for the interval oracles: per-user spans opened
    * when a start clears the running max of all previous ends. */
  private val IntervalSpansSql =
    """e AS (
         SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts) + CAST(floor(value * 100000000) AS BIGINT) AS en
         FROM events),
       m AS (
         SELECT user_id, s, en,
           CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY s, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             OR s > max(en) OVER (PARTITION BY user_id ORDER BY s, en
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS op
         FROM e WHERE s <= en),
       sp AS (SELECT user_id, s, en,
                sum(op) OVER (PARTITION BY user_id ORDER BY s, en) AS span
              FROM m)"""

  /** Shared fit CTEs for the language-ID oracles: trigram explosion and
    * the per-language (count DESC, gram ASC) rank. */
  private val LangProfileSql =
    """tg AS (
         SELECT d.doc_id, d.lang,
           substr(lower(d.text), CAST(p AS INT), 3) AS gram
         FROM documents d,
           LATERAL (SELECT unnest(range(1, length(d.text) - 1)) AS p)),
       cnt AS (SELECT lang, gram, count(*) AS c FROM tg GROUP BY 1, 2),
       prof AS (
         SELECT lang, gram, CAST(row_number() OVER (
           PARTITION BY lang ORDER BY c DESC, gram) AS BIGINT) AS rank
         FROM cnt)"""

  /** The classifier replay shared by q_langid (scan-shaped literal
    * intersect) and q_langid_join (forced broadcast-join path): distinct
    * doc trigrams joined to the fitted profiles, integer overlap scores,
    * (score DESC, lang ASC) argmax, zero-overlap docs -> ('und', 0). */
  private val LangIdSelfCheckSql =
    s"""WITH $LangProfileSql,
        docg AS (SELECT DISTINCT doc_id, gram FROM tg),
        score AS (
          SELECT docg.doc_id, p.lang, count(*) AS score
          FROM docg
          JOIN (SELECT lang, gram FROM prof WHERE rank <= 64) p
            ON docg.gram = p.gram
          GROUP BY 1, 2),
        best AS (
          SELECT doc_id, lang, score, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
          FROM score)
        SELECT d.doc_id,
          coalesce(b.lang, 'und') AS pred_lang,
          CAST(coalesce(b.score, 0) AS BIGINT) AS score,
          (coalesce(b.lang, 'und') = d.lang) AS agrees
        FROM documents d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
          ON d.doc_id = b.doc_id"""
}
