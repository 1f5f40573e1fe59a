package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 additions: TPC-DS-style shapes over the existing TPC-H-ish
  * fixtures (VERDICT r6 #9) — the regression surface the 22 TPC-H
  * queries don't cover: a moving-window sales-deviation report
  * (TPC-DS q47/q57 family) and a returns-ratio screen (q93 family).
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
