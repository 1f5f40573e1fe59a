package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 additions: TPC-DS-style shapes over the existing TPC-H-ish
  * fixtures (VERDICT r6 #9) — the regression surface the 22 TPC-H
  * queries don't cover: a moving-window sales-deviation report
  * (TPC-DS q47/q57 family) and a returns-ratio screen (q93 family) —
  * plus the market-basket affinity oracles
  * ([[graft.relational.Analytics.basketAffinity]]).
  *
  * Determinism: money is quantized per-row to integer cents
  * (`floor(x*100)` — identical IEEE arithmetic in both engines) and all
  * comparisons are cross-multiplied INTEGER predicates (`10·|n·sales −
  * yr| > yr` instead of a 0.1-ratio double compare), so outputs are
  * all-integer and hash-exact under any evaluation order — including
  * DuckDB's segment-tree window sums, which are only bit-stable for
  * integer inputs. */
object Round7Queries {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def cents(c: Column): Column = floor(c * lit(100)).cast("long")

  /** Oracle replay of [[graft.relational.Analytics.basketAffinity]]:
    * the cap keeps the `cap` SMALLEST items per basket (row_number over
    * item ASC == slice of the sorted array); all counts derive from the
    * capped relation; ratios are single double divisions of integral
    * counts, 6-dp — replay-exact. */
  private def basketSql(biSql: String, cap: Int, minPairs: Int): String =
    s"""WITH bi AS (SELECT DISTINCT bk, it FROM ($biSql)),
        r AS (SELECT bk, it,
                row_number() OVER (PARTITION BY bk ORDER BY it) AS rn
              FROM bi),
        si AS (SELECT bk, it FROM r WHERE rn <= $cap),
        n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets
              FROM si),
        ic AS (SELECT it, CAST(count(*) AS BIGINT) AS ci FROM si
               GROUP BY 1),
        p AS (SELECT x.it AS item_a, y.it AS item_b,
                CAST(count(*) AS BIGINT) AS n_ab
              FROM si x JOIN si y ON x.bk = y.bk AND x.it < y.it
              GROUP BY 1, 2 HAVING count(*) >= $minPairs)
        SELECT p.item_a, p.item_b, p.n_ab, ia.ci AS n_a, ib.ci AS n_b,
          n.n_baskets,
          round(CAST(p.n_ab AS DOUBLE) / n.n_baskets, 6) AS support,
          round(CAST(p.n_ab AS DOUBLE) / ia.ci, 6) AS confidence_ab,
          round(CAST(p.n_ab AS DOUBLE) / ib.ci, 6) AS confidence_ba,
          round(CAST(p.n_ab AS DOUBLE) * n.n_baskets /
            (CAST(ia.ci AS DOUBLE) * ib.ci), 6) AS lift
        FROM p
        JOIN ic ia ON p.item_a = ia.it
        JOIN ic ib ON p.item_b = ib.it
        CROSS JOIN n"""

  /** Oracle replay of [[graft.relational.Analytics.abcClasses]] over
    * lineitem revenue cents per supplier: all-integer windowed sums +
    * integer cross-multiplied tier tests + (value DESC, entity) total
    * ordering — replay-exact with no rounding. `grp` is
    * `"l_returnflag,"` or empty; `part` the matching PARTITION BY. */
  private def abcSql(grp: String, part: String): String =
    s"""WITH e AS (
         SELECT $grp l_suppkey,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS value
         FROM lineitem GROUP BY $grp l_suppkey),
       w AS (
         SELECT $grp l_suppkey, value,
           CAST(row_number() OVER ($part
             ORDER BY value DESC, l_suppkey) AS BIGINT) AS rank_in_group,
           CAST(sum(value) OVER ($part ORDER BY value DESC, l_suppkey
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value,
           CAST(sum(value) OVER ($part) AS BIGINT) AS total
         FROM e)
       SELECT $grp l_suppkey, value, rank_in_group, cum_value,
         CASE WHEN cum_value * 100 <= total * 80 THEN 'A'
              WHEN cum_value * 100 <= total * 95 THEN 'B'
              ELSE 'C' END AS abc_class
       FROM w"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-DS q47/q57 shape: monthly revenue per brand, each month
    // carrying its trailing-3-month sum and its brand-year total, keeping
    // months that deviate >10% from the brand-year monthly average.
    // Shape at 100 TB: ONE corpus shuffle (lineitem⋈orders — part
    // broadcasts), then everything runs on the brands×months relation:
    // both windows partition by brand (parallel, task state = one
    // brand's months), no global sort, no second corpus pass.
    "q_tpcds_mavg" -> ((s, d) => {
      val monthly = t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sales_cents"))
      val w3 = Window.partitionBy("p_brand")
        .orderBy(col("o_year"), col("o_month"))
        .rowsBetween(-2, Window.currentRow)
      val wy = Window.partitionBy("p_brand", "o_year")
      monthly
        .withColumn("t3_cents", sum("sales_cents").over(w3))
        .withColumn("yr_cents", sum("sales_cents").over(wy))
        .withColumn("n_months", count(lit(1)).over(wy))
        // integer cross-multiplication of "deviates >10% from the
        // brand-year monthly average" — no ratio doubles anywhere
        .filter(abs(col("sales_cents") * col("n_months") - col("yr_cents"))
          * 10 > col("yr_cents"))
        .select("p_brand", "o_year", "o_month", "sales_cents",
          "t3_cents", "yr_cents", "n_months")
    }),

    // market-basket affinity over the event log: which event types
    // co-occur within a user's history (support/confidence/lift from
    // one capped basket aggregate — Analytics.basketAffinity)
    "q_basket_events" -> ((s, d) =>
      graft.relational.Analytics.basketAffinity(t(s, d, "events"),
        "user_id", "event_type", maxBasket = 64)),

    // integer-item variant at a joinier scale: suppliers co-occurring
    // within an order, pairs seen at least twice
    "q_basket_suppliers" -> ((s, d) =>
      graft.relational.Analytics.basketAffinity(t(s, d, "lineitem"),
        "l_orderkey", "l_suppkey", maxBasket = 16, minPairs = 2L)),

    // per-doc Shannon entropy of the token distribution — the lexical-
    // diversity quality gate (Ranking.tokenEntropy; entropy is
    // aggregate-derived -> round 6)
    "q_token_entropy" -> ((s, d) =>
      graft.text.Ranking.tokenEntropy(t(s, d, "documents"), "text",
          "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          round(col("entropy"), 6).as("entropy"))),

    // Jensen–Shannon divergence between the en and non-en unigram
    // distributions — the corpus-drift scalar (Ranking.jsDivergence)
    "q_jsd" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.text.Ranking.jsDivergence(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") =!= "en"), "text")
        .select(col("n_terms"), col("tokens_a"), col("tokens_b"),
          round(col("jsd"), 6).as("jsd"))
    }),

    // grouped Theil–Sen robust slope: order value (dollars) vs time
    // (epoch seconds) per order priority — the element-pick lower
    // median replays bit-exact, no rounding anywhere
    "q_theilsen" -> ((s, d) =>
      graft.relational.Analytics.theilSen(
        t(s, d, "orders").select(col("o_orderpriority"),
          col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("x_s"),
          col("o_totalprice")),
        "o_orderpriority", "x_s", "o_totalprice", "o_orderkey",
        maxN = 64)),

    // TPC-DS q88 shape: eight independent band screens answered in ONE
    // scan — each band a conditional count inside the same aggregate
    // (the multi-COUNT(*)-subquery formulation collapsed to one pass;
    // integer thresholds, integer outputs). Shape at 100 TB: a single
    // map-side-combined one-row aggregate; no joins, no windows, and
    // the scan prunes to the three columns the bands read.
    "q_tpcds_bands" -> ((s, d) => {
      def band(qLo: Int, qHi: Int, dLoPct: Int, dHiPct: Int) =
        sum(when(col("l_quantity") >= qLo && col("l_quantity") < qHi &&
          col("l_discount") * 100 >= dLoPct &&
          col("l_discount") * 100 < dHiPct, 1L).otherwise(0L))
      t(s, d, "lineitem").agg(
        band(1, 11, 0, 3).as("b1"), band(1, 11, 3, 6).as("b2"),
        band(11, 21, 0, 3).as("b3"), band(11, 21, 3, 6).as("b4"),
        band(21, 31, 0, 3).as("b5"), band(21, 31, 3, 6).as("b6"),
        band(31, 41, 0, 3).as("b7"), band(31, 41, 3, 6).as("b8"))
    }),

    // ABC / Pareto concentration: which suppliers carry 80%/95% of
    // revenue per return flag — integer cents, integer cross-multiplied
    // tier tests, total ordering: replay-exact end to end
    "q_abc" -> ((s, d) =>
      graft.relational.Analytics.abcClasses(
        t(s, d, "lineitem")
          .withColumn("cents", cents(col("l_extendedprice"))),
        Seq("l_returnflag"), "l_suppkey", "cents")),

    // forced global twin: empty groupCols routes the rank/cumulative
    // through the audited BoundedWindow entity-table path
    "q_abc_global" -> ((s, d) =>
      graft.relational.Analytics.abcClasses(
        t(s, d, "lineitem")
          .withColumn("cents", cents(col("l_extendedprice"))),
        Seq.empty, "l_suppkey", "cents")),

    // supplier-concentration profile per return flag: HHI, effective
    // supplier count, and share entropy — the scalar companions to
    // q_abc's per-entity tiers
    "q_concentration" -> ((s, d) =>
      graft.relational.Analytics.concentration(
        t(s, d, "lineitem")
          .withColumn("cents", cents(col("l_extendedprice"))),
        Seq("l_returnflag"), "l_suppkey", "cents")
        .select(col("l_returnflag"), col("n_entities"), col("total"),
          round(col("hhi"), 6).as("hhi"),
          round(col("effective_n"), 6).as("effective_n"),
          round(col("entropy"), 6).as("entropy"))),

    // TPC-DS q93 shape: customers whose returned revenue exceeds 20% of
    // their total, with at least 5 distinct orders — the
    // returns-behavior screen. Shape at 100 TB: one corpus join
    // (lineitem⋈orders) into ONE customer-keyed aggregate with a partial
    // distinct (Expand + two-phase agg, map-side combined); the filter
    // prunes inside the aggregate output — no window, no second pass.
    "q_tpcds_returns" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("total_cents"),
          sum(when(col("l_returnflag") === "R",
            cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .otherwise(lit(0L))).as("ret_cents"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .filter(col("ret_cents") * 5 > col("total_cents") &&
          col("n_orders") >= 5)))

  def oracleSql: Map[String, String] = Map(

    "q_tpcds_mavg" ->
      """WITH monthly AS (
           SELECT p.p_brand,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(month(o.o_orderdate) AS BIGINT) AS o_month,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
               * 100) AS BIGINT)) AS BIGINT) AS sales_cents
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2, 3),
         win AS (
           SELECT p_brand, o_year, o_month, sales_cents,
             CAST(sum(sales_cents) OVER (PARTITION BY p_brand
               ORDER BY o_year, o_month
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS t3_cents,
             CAST(sum(sales_cents) OVER (PARTITION BY p_brand, o_year)
               AS BIGINT) AS yr_cents,
             CAST(count(*) OVER (PARTITION BY p_brand, o_year) AS BIGINT)
               AS n_months
           FROM monthly)
         SELECT * FROM win
         WHERE abs(sales_cents * n_months - yr_cents) * 10 > yr_cents""",

    "q_basket_events" -> basketSql(
      "SELECT user_id AS bk, event_type AS it FROM events " +
        "WHERE user_id IS NOT NULL AND event_type IS NOT NULL",
      cap = 64, minPairs = 1),

    "q_basket_suppliers" -> basketSql(
      "SELECT l_orderkey AS bk, l_suppkey AS it FROM lineitem " +
        "WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL",
      cap = 16, minPairs = 2),

    // HHI / effective-n / entropy are aggregate-derived -> round(6)
    // absorbs summation-order and ln() ulp (the q_unigram policy)
    "q_concentration" ->
      """WITH e AS (
           SELECT l_returnflag, l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS v
           FROM lineitem GROUP BY 1, 2),
         p AS (SELECT * FROM e WHERE v > 0)
         SELECT l_returnflag,
           count(*) AS n_entities,
           CAST(sum(v) AS BIGINT) AS total,
           round(sum(CAST(v AS DOUBLE) * v) /
             (CAST(sum(v) AS DOUBLE) * sum(v)), 6) AS hhi,
           round((CAST(sum(v) AS DOUBLE) * sum(v)) /
             sum(CAST(v AS DOUBLE) * v), 6) AS effective_n,
           round(ln(CAST(sum(v) AS DOUBLE)) -
             sum(CAST(v AS DOUBLE) * ln(CAST(v AS DOUBLE))) /
             CAST(sum(v) AS DOUBLE), 6) AS entropy
         FROM p GROUP BY 1""",

    // identical per-row double arithmetic (l_discount*100) both engines
    // -> identical band membership; integer counts
    "q_tpcds_bands" -> {
      val bands = Seq((1, 11, 0, 3), (1, 11, 3, 6), (11, 21, 0, 3),
        (11, 21, 3, 6), (21, 31, 0, 3), (21, 31, 3, 6), (31, 41, 0, 3),
        (31, 41, 3, 6))
      val cols = bands.zipWithIndex.map { case ((ql, qh, dl, dh), i) =>
        s"""CAST(sum(CASE WHEN l_quantity >= $ql AND l_quantity < $qh
            AND l_discount * 100 >= $dl AND l_discount * 100 < $dh
            THEN 1 ELSE 0 END) AS BIGINT) AS b${i + 1}"""
      }.mkString(",\n           ")
      s"SELECT $cols FROM lineitem"
    },

    // integer cents + integer cross-multiplied tiers + total ordering:
    // windowed sums are INTEGER (exact under DuckDB's segment tree)
    "q_abc" -> abcSql("l_returnflag,", "PARTITION BY l_returnflag"),
    "q_abc_global" -> abcSql("", ""),

    // H = ln(n) − Σ c·ln(c)/n over per-doc token counts; round(6)
    // absorbs ln()/summation-order ulp (the q_unigram_quality policy)
    "q_token_entropy" ->
      """WITH tk AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
           FROM documents),
         c AS (
           SELECT doc_id, t, count(*) AS c FROM tk WHERE t <> ''
           GROUP BY 1, 2)
         SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           round(ln(CAST(sum(c) AS DOUBLE)) -
             sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) /
             CAST(sum(c) AS DOUBLE), 6) AS entropy
         FROM c GROUP BY doc_id""",

    // add-one smoothing over the union vocabulary, both KL halves vs the
    // midpoint mix; round(6) absorbs ln()/summation-order ulp
    "q_jsd" ->
      """WITH ca AS (
           SELECT t, count(*) AS c FROM (
             SELECT unnest(regexp_split_to_array(trim(lower(text)),
               '\s+')) AS t
             FROM documents WHERE lang = 'en') WHERE t <> '' GROUP BY 1),
         cb AS (
           SELECT t, count(*) AS c FROM (
             SELECT unnest(regexp_split_to_array(trim(lower(text)),
               '\s+')) AS t
             FROM documents WHERE lang <> 'en') WHERE t <> '' GROUP BY 1),
         j AS (
           SELECT coalesce(ca.c, 0) AS cnt_a, coalesce(cb.c, 0) AS cnt_b
           FROM ca FULL OUTER JOIN cb ON ca.t = cb.t),
         tot AS (
           SELECT CAST(sum(cnt_a) AS BIGINT) AS ta,
             CAST(sum(cnt_b) AS BIGINT) AS tb, count(*) AS v FROM j),
         p AS (
           SELECT (cnt_a + 1.0) / (CAST(ta AS DOUBLE) + v) AS pa,
             (cnt_b + 1.0) / (CAST(tb AS DOUBLE) + v) AS pb,
             ta, tb, v
           FROM j, tot)
         SELECT max(v) AS n_terms, max(ta) AS tokens_a,
           max(tb) AS tokens_b,
           round((sum(pa * ln(pa / ((pa + pb) / 2.0))) +
             sum(pb * ln(pb / ((pa + pb) / 2.0)))) / 2.0, 6) AS jsd
         FROM p""",

    // the cap keeps the 64 smallest-x points (ties -> lower id); the
    // lower median is an ELEMENT PICK ordered by (slope, i, j) — slopes
    // are per-row IEEE arithmetic on identical inputs, so no rounding
    "q_theilsen" ->
      """WITH src AS (
           SELECT o_orderpriority AS g, o_orderkey AS id,
             CAST(CAST(epoch_us(o_orderdate) AS BIGINT) // 1000000
               AS DOUBLE) AS x,
             o_totalprice AS y
           FROM orders),
         r AS (
           SELECT g, id, x, y,
             row_number() OVER (PARTITION BY g ORDER BY x, id) AS rn
           FROM src),
         c AS (SELECT g, id, x, y FROM r WHERE rn <= 64),
         p AS (
           SELECT a.g, a.id AS i, b.id AS j,
             (b.y - a.y) / (b.x - a.x) AS s
           FROM c a JOIN c b ON a.g = b.g AND a.id < b.id
             AND a.x <> b.x),
         q AS (
           SELECT g, s,
             row_number() OVER (PARTITION BY g ORDER BY s, i, j) AS rn,
             count(*) OVER (PARTITION BY g) AS m
           FROM p),
         n AS (SELECT g, count(*) AS n_used FROM c GROUP BY 1),
         sl AS (
           SELECT q.g, n.n_used, q.m AS n_pairs, q.s AS slope
           FROM q JOIN n ON q.g = n.g
           WHERE q.rn = (q.m + 1) // 2),
         r2 AS (
           SELECT c.g, sl.n_used, sl.n_pairs, sl.slope,
             (c.y - sl.slope * c.x) AS r,
             row_number() OVER (PARTITION BY c.g
               ORDER BY (c.y - sl.slope * c.x), c.id) AS rn
           FROM c JOIN sl ON c.g = sl.g)
         SELECT g AS o_orderpriority, n_used, n_pairs, slope,
           r AS intercept
         FROM r2 WHERE rn = (n_used + 1) // 2""",

    "q_tpcds_returns" ->
      """SELECT o.o_custkey,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
             * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN l.l_returnflag = 'R'
             THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
               * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS ret_cents,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1
         HAVING ret_cents * 5 > total_cents AND n_orders >= 5""")
}
