package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H shapes (Q2, Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q20,
  * Q21, Q22), adapted to the fixture schema — the fixture has no partsupp
  * table and no commit/receipt dates, phone numbers, or comments, so:
  *
  *   - the part-supplier association is `SELECT DISTINCT l_partkey,
  *     l_suppkey FROM lineitem` and "supply cost" is the cheapest observed
  *     line price for the pair (Q2, Q11, Q16, Q20);
  *   - "late" means shipped more than 60 days after ordering, the same
  *     adaptation q_tpch_q4 already uses (Q12, Q21);
  *   - the Q22 "country code" is `c_nationkey % 7`.
  *
  * Determinism notes (the oracle hash-compares bit-for-bit):
  *   - money totals that feed COMPARISONS are quantized per-row to integer
  *     cents (`floor(x * 100)` — identical IEEE arithmetic in Spark and
  *     DuckDB) and summed as BIGINT, so group totals are exact and
  *     order-independent (Q11, Q15, Q22);
  *   - `l_quantity` is an integral double (1..50), so double sums/avgs over
  *     it are exact in any order (Q17, Q20);
  *   - display-only money sums are rounded to 6 dp on both sides, the
  *     repo-wide convention (Q9, Q17).
  *
  * Completes the 22-query TPC-H regression surface together with
  * Q1/Q3/Q4/Q5/Q6/Q7/Q8/Q10/Q14/Q18/Q19 in [[DataQueries]].
  */
object TpchQueries {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Per-row integer-cents quantization — exact, order-independent sums. */
  private def cents(c: Column): Column = floor(c * lit(100)).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2: min-cost supplier per part within a region — the aggregate
    // subquery joined back on (key, min). supply/mincost are derived
    // relations; every dimension side broadcasts, only the supply
    // aggregation over lineitem shuffles.
    "q_tpch_q2" -> ((s, d) => {
      val supply = t(s, d, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("cost"))
      val eur = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
            .join(t(s, d, "region").filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
      val eurSupply = supply
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
      // minCost is per-part cardinality — at TPC-H scale part is a big
      // table, so no broadcast hint: both sides already hash by partkey
      // from the same upstream aggregate, and AQE picks the strategy
      val minCost = eurSupply.groupBy(col("l_partkey").as("__mpk"))
        .agg(min(col("cost")).as("mincost"))
      eurSupply
        .join(minCost,
          col("l_partkey") === col("__mpk") &&
            col("cost") === col("mincost"))
        .join(broadcast(t(s, d, "part")
            .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost")
    }),

    // Q9: product-line profit by supplier nation and order year — the
    // LIKE-filtered 5-table join; part/supplier/nation broadcast, the
    // lineitem⋈orders join is the only shuffle.
    "q_tpch_q9" -> ((s, d) => {
      val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "nation")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(broadcast(t(s, d, "part")
            .filter(col("p_name").contains("widget")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          6).as("sum_profit"))
    }),

    // Q11: important-stock cut — per-part value vs a global-threshold
    // scalar. Integer-cents sums keep the threshold comparison exact;
    // the one-row total broadcasts into a cross join (never a shuffle).
    "q_tpch_q11" -> ((s, d) => {
      val eurSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
            .join(t(s, d, "region").filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val value = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          cents(col("l_extendedprice")).as("__cents"))
        .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum("__cents").as("value_cents"))
      val total = value.agg(sum("value_cents").as("__total"))
      value.crossJoin(broadcast(total))
        .filter(col("value_cents") * lit(1000L) > col("__total"))
        .select(col("l_partkey").as("p_partkey"), col("value_cents"))
    }),

    // Q12: late-shipment counts split by order priority — conditional
    // aggregation over the fact join, 1996 ship year only.
    "q_tpch_q12" -> ((s, d) => {
      val high = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_shipdate", "l_returnflag")
        .join(t(s, d, "orders")
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
    }),

    // Q13: customer order-count distribution — LEFT OUTER join with the
    // filter inside the join condition (zero-order customers must
    // survive), then a two-level aggregation.
    "q_tpch_q13" -> ((s, d) =>
      t(s, d, "customer").select("c_custkey")
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey",
            "o_orderpriority"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "5-LOW",
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))),

    // Q15: top supplier by one-quarter revenue — the max-scalar selection.
    // Revenue is exact integer cents so "equal to the max" cannot be
    // perturbed by summation order; ties all surface (original Q15
    // semantics).
    "q_tpch_q15" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("__cents"))
        .groupBy("l_suppkey")
        .agg(sum("__cents").as("total_rev_cents"))
      val top = rev.agg(max("total_rev_cents").as("__max"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_rev_cents") === col("__max"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_cents")
    }),

    // Q16: distinct-supplier counts per part attribute — NOT IN as an
    // anti-join against the negative-balance supplier set, then
    // count(DISTINCT) per (brand, type, size).
    "q_tpch_q16" -> ((s, d) =>
      t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(t(s, d, "supplier")
            .filter(col("s_acctbal") < 0).select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, d, "part")
            .filter(col("p_brand") =!= "Brand#1" &&
              col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
            .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))),

    // Q17: small-quantity-order revenue — the correlated per-part average
    // as an aggregate joined back. l_quantity is an integral double so
    // the 0.2*avg threshold is exact in both engines.
    "q_tpch_q17" -> ((s, d) => {
      // part attrs are functions of the key, so pruning lineitem by the
      // filtered part set BEFORE the per-part average keeps the average
      // identical (all lines of a surviving part survive) while the
      // aggregate only ever sees the selected parts' rows
      val liF = t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_brand") === "Brand#2" && col("p_type") === "SMALL")
          .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
      val avgQty = liF.groupBy(col("l_partkey").as("__apk"))
        .agg(avg(col("l_quantity")).as("__avg_qty"))
      liF.join(avgQty, col("l_partkey") === col("__apk"))
        .filter(col("l_quantity") < lit(0.2) * col("__avg_qty"))
        .agg(round(sum(col("l_extendedprice")) / lit(7.0), 6)
          .as("avg_yearly"))
    }),

    // Q20: suppliers with excess 1996 shipments of large* parts, in one
    // region — two correlated quantity aggregates compared exactly
    // (integral doubles; *0.5 is a power-of-two scale), then a semi-join
    // chain up to the supplier list.
    "q_tpch_q20" -> ((s, d) => {
      val qty = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
            .filter(col("p_name").startsWith("large")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
          sum(when(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
              && col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
            col("l_quantity")).otherwise(lit(0.0))).as("qty96"),
          sum(col("l_quantity")).as("qty_all"))
        .filter(col("qty96") > lit(0.5) * col("qty_all"))
        .select("l_suppkey").distinct()
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
            .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qty, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    }),

    // Q21: suppliers who kept F-status orders waiting — the only late
    // supplier on a multi-supplier order. The EXISTS / NOT EXISTS pair is
    // re-expressed as per-order distinct counts (supp_cnt >= 2 and
    // late_supp_cnt = 1), one aggregation instead of two correlated
    // joins — same semantics, half the shuffles.
    "q_tpch_q21" -> ((s, d) => {
      val lo = t(s, d, "lineitem").select("l_orderkey", "l_suppkey",
          "l_shipdate")
        .join(t(s, d, "orders")
            .filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 60 DAYS")).as("__late"))
      val perOrder = lo.groupBy("l_orderkey")
        .agg(
          countDistinct(col("l_suppkey")).as("__supp_cnt"),
          countDistinct(when(col("__late"), col("l_suppkey")))
            .as("__late_cnt"))
        .filter(col("__supp_cnt") >= 2 && col("__late_cnt") === 1)
        .select(col("l_orderkey").as("__wok"))
      lo.filter(col("__late"))
        .join(perOrder, col("l_orderkey") === col("__wok"), "left_semi")
        .select("l_orderkey", "l_suppkey").distinct()
        .join(broadcast(t(s, d, "supplier")
            .join(broadcast(t(s, d, "nation")
                .join(t(s, d, "region")
                    .filter(col("r_name") === "AMERICA"),
                  col("n_regionkey") === col("r_regionkey"))
                .select("n_nationkey")),
              col("s_nationkey") === col("n_nationkey"))
            .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
    }),

    // Q22: dormant rich customers by "country code" (c_nationkey % 7) —
    // the positive-balance average threshold is compared as an exact
    // integer cross-product (acct_cents * n_pos > sum_pos_cents), and
    // "dormant" (no orders since 2000 — the fixture's order stream is
    // dense enough that literally order-free customers don't exist) is
    // an anti-join against the recent-order keys.
    "q_tpch_q22" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"),
          (col("c_nationkey") % 7).cast("int").as("cntrycode"),
          col("c_acctbal"), cents(col("c_acctbal")).as("__cents"))
      val posAvg = cust.filter(col("c_acctbal") > 0)
        .agg(sum("__cents").as("__sum_pos"),
          count(lit(1)).as("__n_pos"))
      cust.filter(col("cntrycode").isin(0, 1, 2, 3))
        .crossJoin(broadcast(posAvg))
        .filter(col("__cents") * col("__n_pos") > col("__sum_pos"))
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          sum("__cents").as("totacctbal_cents"))
    }))

  def oracleSql: Map[String, String] = Map(

    "q_tpch_q2" ->
      """WITH supply AS (
           SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
           FROM lineitem GROUP BY 1, 2),
         eur AS (
           SELECT s_suppkey, s_acctbal, s_name, n_name
           FROM supplier s
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'EUROPE'),
         es AS (
           SELECT supply.*, eur.s_acctbal, eur.s_name, eur.n_name
           FROM supply JOIN eur ON supply.l_suppkey = eur.s_suppkey),
         mc AS (
           SELECT l_partkey, min(cost) AS mincost FROM es GROUP BY 1)
         SELECT es.s_acctbal, es.s_name, es.n_name, p.p_partkey, es.cost
         FROM es
         JOIN mc ON es.l_partkey = mc.l_partkey AND es.cost = mc.mincost
         JOIN part p ON es.l_partkey = p.p_partkey
         WHERE p.p_size = 15 AND p.p_type = 'STANDARD'""",

    "q_tpch_q9" ->
      """SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 6)
             AS sum_profit
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE p.p_name LIKE '%widget%'
         GROUP BY 1, 2""",

    "q_tpch_q11" ->
      """WITH value AS (
           SELECT l.l_partkey,
             sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
               AS value_cents
           FROM lineitem l
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE r.r_name = 'EUROPE'
           GROUP BY 1)
         SELECT l_partkey AS p_partkey,
           CAST(value_cents AS BIGINT) AS value_cents
         FROM value
         WHERE value_cents * 1000 >
           (SELECT sum(value_cents) FROM value)""",

    "q_tpch_q12" ->
      """SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
           AND l.l_shipdate < TIMESTAMP '1997-01-01'
           AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
         GROUP BY 1""",

    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c.c_custkey, count(o.o_orderkey) AS c_count
           FROM customer c
           LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '5-LOW'
           GROUP BY 1)
         GROUP BY 1""",

    "q_tpch_q15" ->
      """WITH rev AS (
           SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) AS total_rev_cents
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY 1)
         SELECT s.s_suppkey, s.s_name,
           CAST(rev.total_rev_cents AS BIGINT) AS total_rev_cents
         FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
         WHERE rev.total_rev_cents =
           (SELECT max(total_rev_cents) FROM rev)""",

    "q_tpch_q16" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part p ON ps.l_partkey = p.p_partkey
         WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
           AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
           AND ps.l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3""",

    "q_tpch_q17" ->
      """SELECT round(sum(l.l_extendedprice) / 7.0, 6) AS avg_yearly
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         WHERE p.p_brand = 'Brand#2' AND p.p_type = 'SMALL'
           AND l.l_quantity < (
             SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)""",

    "q_tpch_q20" ->
      """WITH excess AS (
           SELECT l.l_suppkey FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_name LIKE 'large%'
           GROUP BY l.l_suppkey, l.l_partkey
           HAVING sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01'
               AND l.l_shipdate < TIMESTAMP '1997-01-01'
               THEN l.l_quantity ELSE 0.0 END) > 0.5 * sum(l.l_quantity))
         SELECT s.s_suppkey, s.s_name
         FROM supplier s
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'
           AND s.s_suppkey IN (SELECT l_suppkey FROM excess)""",

    "q_tpch_q21" ->
      """WITH lo AS (
           SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderstatus = 'F'),
         waiting AS (
           SELECT l_orderkey FROM lo
           GROUP BY 1
           HAVING count(DISTINCT l_suppkey) >= 2
             AND count(DISTINCT CASE WHEN late THEN l_suppkey END) = 1)
         SELECT s.s_name, count(*) AS numwait FROM (
           SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
           FROM lo JOIN waiting ON lo.l_orderkey = waiting.l_orderkey
           WHERE lo.late) w
         JOIN supplier s ON w.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'AMERICA'
         GROUP BY 1""",

    "q_tpch_q22" ->
      """WITH cust AS (
           SELECT c_custkey,
             CAST(c_nationkey % 7 AS INT) AS cntrycode, c_acctbal,
             CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         pos AS (
           SELECT sum(cents) AS sum_pos, count(*) AS n_pos
           FROM cust WHERE c_acctbal > 0)
         SELECT cntrycode, count(*) AS numcust,
           CAST(sum(cents) AS BIGINT) AS totacctbal_cents
         FROM cust, pos
         WHERE cntrycode IN (0, 1, 2, 3)
           AND cents * n_pos > sum_pos
           AND NOT EXISTS (
             SELECT 1 FROM orders o WHERE o.o_custkey = cust.c_custkey
               AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY 1""")
}
