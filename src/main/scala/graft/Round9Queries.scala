package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 additions: label-propagation community detection (the
  * deterministic-tie variant, oracled by the unrolled vote replay),
  * t-closeness (completing the k-anonymity / l-diversity
  * re-identification ladder), the hashing-trick feature encoder
  * (fit-free, md5-portable), integer-exact full-horizon EWMA (the
  * recursive-CTE oracle shows the sequential recurrence replays
  * engine-independently), HBOS histogram-density outlier scoring,
  * reciprocal-rank fusion for hybrid retrieval, incremental IVF
  * indexing (fit-half + add-half shares the one-shot oracle), and
  * monotonic (isotonic-pooled) WOE binning.
  *
  * Shared determinism rules (the Round8Queries conventions): every
  * set-defining decision is integer/string arithmetic; floats appear
  * only as exact power-of-two scalings or in 6-dp-rounded output
  * columns.
  */
object Round9Queries {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Customer–part co-purchase bipartite edges — the q_kcore/q_bfs
    * graph, reused so the community structure is comparable. */
  private def coPurchase(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))

  private val coPurchaseSql =
    """SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
         'p' || CAST(l.l_partkey AS VARCHAR) AS dst
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"""

  private val LpaRounds = 3
  private val EwmaNum = 1
  private val EwmaK = 2
  private val HashBuckets = 64
  private val HashScale = 1L << 20
  private val OutlierBins = 32
  private val OutlierTop = 100

  /** Unit relation for q_cuped: one row per user, covariate = cents in
    * the pre-period (before Jan 15), metric = cents in the post-period,
    * variant = user_id mod 2 — all exact integer arithmetic. */
  private val CupedCutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z
  private def cupedUnits(s: SparkSession, d: String): DataFrame =
    DataQueries.readEventsMicros(s, d)
      .withColumn("__c", floor(col("value") * 100).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("tsu") < CupedCutoffUs, col("__c")).otherwise(0L))
          .as("x_pre"),
        sum(when(col("tsu") >= CupedCutoffUs, col("__c")).otherwise(0L))
          .as("y_post"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CUPED variance-reduced A/B readback (Deng et al. WSDM'13): θ fit
    // on all units' exact cent sums, per-variant adjusted means
    "q_cuped" -> ((s, d) =>
      graft.relational.Analytics.cuped(cupedUnits(s, d),
        "variant", "y_post", "x_pre")),

    // deterministic label-propagation communities over the co-purchase
    // graph: min-label ties + self-vote, 3 synchronous rounds
    "q_communities" -> ((s, d) =>
      graft.relational.Graph.labelPropagation(
        coPurchase(s, d), "src", "dst", rounds = LpaRounds)),

    // t-closeness audit: does any (status, order-year) cohort's
    // priority distribution drift more than t=0.1 EMD from the table's?
    "q_tcloseness" -> ((s, d) =>
      graft.relational.Analytics.tCloseness(
        t(s, d, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("long")),
        Seq("o_orderstatus", "o_year"), "o_orderpriority", t = 0.1)),

    // hashing-trick encoder: two categoricals + one numeric into 64
    // buckets, emitted sparse (bucket, value) for the oracle
    "q_feature_hash" -> ((s, d) => {
      val hashed = new graft.operators.FeatureHasher(
        Seq("c_mktsegment", "c_nationkey"), Seq("c_acctbal"),
        "fh", HashBuckets, HashScale).transform(t(s, d, "customer"))
      hashed.select(col("c_custkey"),
          posexplode(col("fh")).as(Seq("bucket", "v")))
        .filter(col("v") =!= 0.0)
    }),

    // integer-exact EWMA over each user's event-value series
    "q_ewma" -> ((s, d) =>
      graft.relational.Eval.ewma(
          DataQueries.readEventsMicros(s, d), Seq("user_id"), "tsu",
          "value", alphaNum = EwmaNum, k = EwmaK)
        .select(col("user_id").as("key"), col("tsu").as("o"),
          col("value").as("x"), col("ewma_units"), col("ewma"))),

    // HBOS density outliers: the 100 least-dense events over
    // (value, second-of-day) 32-bin histograms — "odd amount at an odd
    // hour" is the classic fraud read (event_id is the unique key;
    // lineitem's (orderkey, linenumber) is NOT unique in this data)
    "q_density_outliers" -> ((s, d) =>
      graft.relational.Analytics.histogramOutliers(
        DataQueries.readEventsMicros(s, d).withColumn("sod",
          expr("(tsu % 86400000000) div 1000000")),
        "event_id", Seq("value", "sod"),
        nBins = OutlierBins, topN = OutlierTop)),

    // hybrid retrieval: RRF-fuse the BM25 top-200 with the
    // unigram-quality top-200 (both ranked on ROUNDED metrics after a
    // bounded TakeOrdered cut — never a global window over the corpus)
    "q_rrf" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def topRanked(scored: DataFrame): DataFrame = scored
        .orderBy(col("m").desc, col("doc_id")).limit(RrfTop)
        // bounded: ranked AFTER limit(RrfTop)
        .withColumn("rank", row_number().over(graft.util.BoundedWindow
          .global(col("m").desc, col("doc_id"))))
        .select("doc_id", "rank")
      val lexical = topRanked(
        graft.text.Ranking.bm25(docs, "text", "doc_id",
            Seq("the", "data", "model"))
          .select(col("doc_id"), round(col("bm25"), 6).as("m")))
      val quality = topRanked(
        graft.text.Ranking.unigramLogProb(docs, "text", "doc_id")
          .select(col("doc_id"), round(col("avg_logprob"), 6).as("m")))
      graft.text.Ranking.rrfFuse(Seq(lexical, quality), Nil, "doc_id",
        kk = RrfK)
    }),

    // incremental IVF: fit on the even half, add() the odd half, query
    // at FULL probe — exact by construction, so the result must equal
    // the one-shot q_sim_ivf bit for bit (same oracle) even though the
    // quantizer only ever saw half the corpus
    "q_sim_ivf_add" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val idx = graft.sim.IvfIndex.fit(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          nCentroids = 16)
        .add(emb.filter(col("vec_id") % 2 === 1))
      val out = idx.query(queries, "query_id", "qvec", k = 5, nProbe = 16)
        .select(col("query_id"), col("vec_id"),
          round(col("sim"), 6).as("sim"))
        .localCheckpoint(true)
      idx.release()
      out
    }),

    // scorecard coarse classing: isotonic-pooled monotonic WOE bins of
    // order value against the fell-through label
    "q_monotonic_bins" -> ((s, d) =>
      graft.relational.Scorecard.monotonicBins(
        t(s, d, "orders").withColumn("y",
          when(col("o_orderstatus") === "F", 1).otherwise(0)),
        "o_totalprice", "y", nPreBins = MonoBins)),

    // grouped RRF: per SOURCE, fuse the length top-5 with the
    // unigram-quality top-5 — both cut by the bounded-heap
    // topKPerGroup, fused independently per group
    "q_rrf_grouped" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val byLen = graft.relational.Relational.topKPerGroup(
          docs, Seq("source"), "n_chars", "doc_id", RrfGroupK)
        .select(col("source"), col("doc_id"), col("rank"))
      val quality = graft.text.Ranking
        .unigramLogProb(docs, "text", "doc_id")
        .select(col("doc_id"), round(col("avg_logprob"), 6).as("m"))
        .join(docs.select("doc_id", "source"), "doc_id")
      val byQ = graft.relational.Relational.topKPerGroup(
          quality, Seq("source"), "m", "doc_id", RrfGroupK)
        .select(col("source"), col("doc_id"), col("rank"))
      graft.text.Ranking.rrfFuse(Seq(byLen, byQ), Seq("source"),
        "doc_id", kk = RrfK)
    })
  )

  private val RrfGroupK = 5

  private val MonoBins = 32

  private val RrfTop = 200
  private val RrfK = 60

  /** DuckDB md5₆₀ of a string expression — the engine-portable hash
    * every hashing path here shares (Corpus.hashUniform convention). */
  private def h60(sqlExpr: String): String =
    s"CAST(('0x' || substr(md5($sqlExpr), 1, 15)) AS BIGINT)"

  /** One FeatureHasher contribution arm: bucket + signed units. */
  private def hashArm(keyExpr: String, unitsExpr: String,
      notNull: String): String =
    s"""SELECT c_custkey,
         ${h60(keyExpr)} % $HashBuckets AS b,
         (CASE WHEN ${h60(s"'s:' || $keyExpr")} % 2 = 0
               THEN 1 ELSE -1 END) * ($unitsExpr) AS u
       FROM customer WHERE $notNull"""

  def oracleSql: Map[String, String] = Map(

    // exact cent sums per unit → θ from long→double conversions and one
    // division (the identical fixed-order IEEE expressions the Spark
    // side evaluates on the driver) → per-variant adjusted means
    "q_cuped" ->
      s"""WITH u AS (
            SELECT user_id,
              CAST(sum(CASE WHEN epoch_us(ts) < $CupedCutoffUs
                THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS x,
              CAST(sum(CASE WHEN epoch_us(ts) >= $CupedCutoffUs
                THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS y
            FROM events GROUP BY 1),
          g AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(x * y) AS BIGINT) AS sxy
            FROM u),
          th AS (
            SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mxg,
              CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                   THEN 0.0
                   ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              END AS theta
            FROM g)
          SELECT CAST(user_id % 2 AS VARCHAR) AS variant,
            CAST(count(*) AS BIGINT) AS n_units,
            round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS mean_metric,
            round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mean_covariate,
            round(CAST(sum(y) AS DOUBLE) / count(*)
              - theta * (CAST(sum(x) AS DOUBLE) / count(*) - mxg), 6)
              AS mean_adjusted,
            round(theta, 6) AS theta
          FROM u, th GROUP BY 1, theta, mxg""",

    "q_communities" ->
      graft.relational.Graph.labelPropagationSql(coPurchaseSql, LpaRounds),

    // full probe is exact, so fit-half + add-half answers the identical
    // brute-force oracle as the one-shot fit
    "q_sim_ivf_add" -> DataQueries.oracleSql("q_sim_ivf"),

    // the EvalQueries isotonic CTE chain over equal-width quantized
    // pre-bins, then pooling on the bit-identical fitted doubles
    "q_monotonic_bins" ->
      s"""WITH src AS (
           SELECT CAST(floor(o_totalprice * 1048576) AS BIGINT) AS xq,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
           FROM orders
           WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)),
         mx AS (SELECT min(xq) AS lo, max(xq) AS hi FROM src),
         b AS (
           SELECT ((xq - lo) * $MonoBins) // (hi - lo + 1) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos
           FROM src, mx GROUP BY 1),
         c AS (
           SELECT bin, n, n_pos,
             CAST(sum(n) OVER w AS BIGINT) AS cn,
             CAST(sum(n_pos) OVER w AS BIGINT) AS cp
           FROM b WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)),
         seg AS (
           SELECT i.bin AS bi, j.bin AS bj,
             CAST(j.cp - (i.cp - i.n_pos) AS DOUBLE) /
               CAST(j.cn - (i.cn - i.n) AS DOUBLE) AS a
           FROM c i JOIN c j ON i.bin <= j.bin),
         mmx AS (
           SELECT k.bin AS bin, seg.bi, min(seg.a) AS mn
           FROM seg JOIN b k ON seg.bi <= k.bin AND seg.bj >= k.bin
           GROUP BY 1, 2),
         iso AS (SELECT bin, max(mn) AS iso FROM mmx GROUP BY 1),
         p AS (
           SELECT b.bin, b.n, b.n_pos, iso.iso,
             CASE WHEN lag(iso.iso) OVER (ORDER BY b.bin) IS NULL
                    OR iso.iso <> lag(iso.iso) OVER (ORDER BY b.bin)
                  THEN 1 ELSE 0 END AS chg
           FROM b JOIN iso USING (bin)),
         pl AS (
           SELECT *, CAST(sum(chg) OVER
             (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pool
           FROM p),
         g AS (
           SELECT pool, min(bin) AS bin_lo, max(bin) AS bin_hi,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(n_pos) AS BIGINT) AS n_pos,
             max(iso) AS iso
           FROM pl GROUP BY 1),
         t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS pt,
                 CAST(sum(n - n_pos) AS BIGINT) AS nt FROM g)
         SELECT pool, bin_lo, bin_hi, n, n_pos,
           round(iso, 6) AS iso_rate,
           round(ln(((n - n_pos + 0.5) / t.nt) / ((n_pos + 0.5) / t.pt)),
             6) AS woe
         FROM g, t""",

    // the ordered-EMD replay: every accumulation is an ordered window
    // cumsum (fixed fold order), the violation predicate compares the
    // 6-dp-ROUNDED emd — bit-identical to the Spark side
    "q_tcloseness" ->
      """WITH rows0 AS (
           SELECT o_orderstatus AS k1,
             CAST(year(o_orderdate) AS BIGINT) AS k2,
             CAST(o_orderpriority AS VARCHAR) AS v
           FROM orders WHERE o_orderpriority IS NOT NULL),
         vals AS (SELECT v, count(*) AS cg FROM rows0 GROUP BY 1),
         -- 'tt' not 'N': DuckDB identifiers are case-insensitive, so a
         -- column N would capture the per-group n in the ECDF division
         tot AS (SELECT CAST(sum(cg) AS BIGINT) AS tt,
                   count(*) AS m FROM vals),
         g AS (SELECT k1, k2, count(*) AS n FROM rows0 GROUP BY 1, 2),
         gv AS (SELECT k1, k2, v, count(*) AS c
                FROM rows0 GROUP BY 1, 2, 3),
         grid AS (
           SELECT g.k1, g.k2, g.n, vals.v, vals.cg, tot.tt, tot.m,
             coalesce(gv.c, 0) AS c
           FROM g CROSS JOIN vals CROSS JOIN tot
           LEFT JOIN gv ON gv.k1 = g.k1 AND gv.k2 = g.k2
             AND gv.v = vals.v),
         cum AS (
           SELECT *,
             CAST(sum(c) OVER wc AS DOUBLE) / n
               - CAST(sum(cg) OVER wc AS DOUBLE) / tt AS diff,
             row_number() OVER wo AS rn
           FROM grid
           WINDOW wo AS (PARTITION BY k1, k2 ORDER BY v),
             wc AS (PARTITION BY k1, k2 ORDER BY v
                    ROWS UNBOUNDED PRECEDING)),
         cum2 AS (
           SELECT *, sum(abs(diff)) OVER wc2 AS cumabs
           FROM cum
           WINDOW wc2 AS (PARTITION BY k1, k2 ORDER BY v
                          ROWS UNBOUNDED PRECEDING)),
         -- m = 1 mirror of the Spark branch: single sensitive value ⇒
         -- every group's EMD is 0 by definition (read the only grid row)
         emd AS (
           SELECT k1, k2, n, m, tt,
             CASE WHEN m = 1 THEN 0.0
                  ELSE round(cumabs / CAST(m - 1 AS DOUBLE), 6) END AS e
           FROM cum2 WHERE rn = greatest(m - 1, 1))
         SELECT CAST(0.1 AS DOUBLE) AS t,
           count(*) AS n_groups,
           max(m) AS m_values,
           max(e) AS max_emd,
           CAST(sum(CASE WHEN e > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(sum(CASE WHEN e > 0.1 THEN n ELSE 0 END) AS BIGINT)
             AS violating_rows,
           round(CAST(sum(CASE WHEN e > 0.1 THEN n ELSE 0 END) AS DOUBLE)
             / max(tt), 6) AS violating_share
         FROM emd""",

    // integer-unit hashing replay: bucket and sign md5s, floor-quantized
    // numeric units, free-order INTEGER sum per bucket, exact /2^20
    "q_feature_hash" -> {
      val arms = Seq(
        hashArm("'c_mktsegment=' || c_mktsegment", s"$HashScale",
          "c_mktsegment IS NOT NULL"),
        hashArm("'c_nationkey=' || CAST(c_nationkey AS VARCHAR)",
          s"$HashScale", "c_nationkey IS NOT NULL"),
        hashArm("'c_acctbal'",
          s"CAST(floor(c_acctbal * $HashScale) AS BIGINT)",
          "c_acctbal IS NOT NULL AND NOT isnan(c_acctbal)"))
        .mkString("\n UNION ALL\n")
      s"""WITH f AS (
         $arms)
         SELECT c_custkey, CAST(b AS INT) AS bucket,
           CAST(sum(u) AS DOUBLE) / $HashScale AS v
         FROM f GROUP BY 1, 2 HAVING sum(u) <> 0"""
    },

    "q_ewma" -> graft.relational.Eval.ewmaSql(
      "SELECT user_id AS key, epoch_us(ts) AS o, value AS x FROM events",
      alphaNum = EwmaNum, k = EwmaK),

    // grouped RRF replay: the per-source (score DESC, id) row_number
    // cuts mirror topKPerGroup's heap tie rule, fusion per group
    "q_rrf_grouped" ->
      s"""WITH a AS (
           SELECT source, doc_id, CAST(rank AS BIGINT) AS r
           FROM (SELECT source, doc_id,
                   row_number() OVER (PARTITION BY source
                     ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id)
                     AS rank
                 FROM documents)
           WHERE rank <= $RrfGroupK),
         tok AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
           FROM documents),
         f AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT count(*) AS nt FROM tok),
         uq AS (
           SELECT doc_id,
             round(avg(ln(CAST(f.c AS DOUBLE) / tot.nt)), 6) AS m
           FROM tok JOIN f USING (t), tot GROUP BY doc_id),
         b AS (
           SELECT source, doc_id, CAST(rank AS BIGINT) AS r
           FROM (SELECT d.source, u.doc_id,
                   row_number() OVER (PARTITION BY d.source
                     ORDER BY CAST(u.m AS DOUBLE) DESC, u.doc_id) AS rank
                 FROM uq u JOIN documents d USING (doc_id))
           WHERE rank <= $RrfGroupK),
         fused AS (
           SELECT source, doc_id, a.r AS rank_0, b.r AS rank_1,
             coalesce(1.0 / ($RrfK + a.r), 0.0)
               + coalesce(1.0 / ($RrfK + b.r), 0.0) AS rrf_score
           FROM a FULL OUTER JOIN b USING (source, doc_id))
         SELECT source, doc_id, rank_0, rank_1, rrf_score,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
         FROM fused""",

    // RRF replay: the same rounded-metric rankings, post-limit ranks,
    // fixed-order 1/(kk+r) sum (IEEE-exact both engines, NOT rounded —
    // per-row arithmetic), and the (score DESC, id) re-rank
    "q_rrf" ->
      s"""WITH tk AS (
           SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
           FROM documents),
         st AS (
           SELECT count(*) AS n, avg(len(ts)) AS avgdl,
             sum(CASE WHEN list_contains(ts, 'the') THEN 1 ELSE 0 END)
               AS df_the,
             sum(CASE WHEN list_contains(ts, 'data') THEN 1 ELSE 0 END)
               AS df_data,
             sum(CASE WHEN list_contains(ts, 'model') THEN 1 ELSE 0 END)
               AS df_model
           FROM tk),
         bm AS (
           SELECT tk.doc_id, round(coalesce(
             ln(1 + (st.n - st.df_the + 0.5) / (st.df_the + 0.5)) *
               (len(list_filter(ts, x -> x = 'the')) * 2.2) /
               (len(list_filter(ts, x -> x = 'the')) +
                1.2 * (0.25 + 0.75 * len(ts) / st.avgdl)) +
             ln(1 + (st.n - st.df_data + 0.5) / (st.df_data + 0.5)) *
               (len(list_filter(ts, x -> x = 'data')) * 2.2) /
               (len(list_filter(ts, x -> x = 'data')) +
                1.2 * (0.25 + 0.75 * len(ts) / st.avgdl)) +
             ln(1 + (st.n - st.df_model + 0.5) / (st.df_model + 0.5)) *
               (len(list_filter(ts, x -> x = 'model')) * 2.2) /
               (len(list_filter(ts, x -> x = 'model')) +
                1.2 * (0.25 + 0.75 * len(ts) / st.avgdl)), 0.0), 6) AS m
           FROM tk, st),
         tok AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
           FROM documents),
         f AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT count(*) AS nt FROM tok),
         uq AS (
           SELECT doc_id,
             round(avg(ln(CAST(f.c AS DOUBLE) / tot.nt)), 6) AS m
           FROM tok JOIN f USING (t), tot GROUP BY doc_id),
         a AS (SELECT doc_id, row_number() OVER
                 (ORDER BY m DESC, doc_id) AS r FROM bm),
         a2 AS (SELECT doc_id, r FROM a WHERE r <= $RrfTop),
         b AS (SELECT doc_id, row_number() OVER
                 (ORDER BY m DESC, doc_id) AS r FROM uq),
         b2 AS (SELECT doc_id, r FROM b WHERE r <= $RrfTop),
         fused AS (
           SELECT doc_id, a2.r AS rank_0, b2.r AS rank_1,
             coalesce(1.0 / ($RrfK + a2.r), 0.0)
               + coalesce(1.0 / ($RrfK + b2.r), 0.0) AS rrf_score
           FROM a2 FULL OUTER JOIN b2 USING (doc_id))
         SELECT doc_id, rank_0, rank_1, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
             AS BIGINT) AS fused_rank
         FROM fused""",

    // HBOS replay: same quantization, same integer bin arithmetic
    // (`//` and Spark's `div` both truncate on nonnegative operands),
    // histogram joins, and the (score, id) exact-keyed cut; the score
    // multiplies counts in FEATURE-NAME order ("sod" < "value"),
    // matching the Spark side's sorted fold
    "q_density_outliers" ->
      s"""WITH src AS (
           SELECT event_id,
             CAST(floor(value * 1048576) AS BIGINT) AS q1,
             CAST(floor(((epoch_us(ts) % 86400000000) // 1000000)
               * 1048576.0) AS BIGINT) AS q2
           FROM events
           WHERE value IS NOT NULL AND NOT isnan(value)),
         mm AS (SELECT min(q1) AS lo1, max(q1) AS hi1,
                  min(q2) AS lo2, max(q2) AS hi2 FROM src),
         b AS (SELECT event_id,
             ((q1 - lo1) * $OutlierBins) // (hi1 - lo1 + 1) AS bv,
             ((q2 - lo2) * $OutlierBins) // (hi2 - lo2 + 1) AS bs
           FROM src, mm),
         hv AS (SELECT bv, count(*) AS c FROM b GROUP BY 1),
         hs AS (SELECT bs, count(*) AS c FROM b GROUP BY 1)
         SELECT b.event_id, CAST(hs.c AS DOUBLE) * hv.c AS score,
           b.bv AS bin_value, b.bs AS bin_sod
         FROM b JOIN hv USING (bv) JOIN hs USING (bs)
         ORDER BY score, b.event_id LIMIT $OutlierTop"""
  )
}
