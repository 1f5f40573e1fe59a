package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-6 TPC-H completions (Q2/Q9/Q11/Q12/Q13/Q15/
  * Q16/Q17/Q20/Q21/Q22 in [[TpchQueries]]) on the sf0.001 fixture. The
  * oracle already hash-compares every query against DuckDB; these tests
  * pin the SEMANTICS against independent formulations so a same-wrong-
  * answer drift on both engines (e.g. a filter quietly moved across a
  * join) cannot pass silently.
  */
class TpchShapesSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private def t(name: String) = spark.read.parquet(s"$d/$name.parquet")
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("q13: distribution conserves the customer population, " +
    "including a zero-order bucket") {
    val dist = q("q_tpch_q13").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.values.sum == t("customer").count())
    // the 5-LOW-only / order-free customers survive the outer join
    val zeroCustomers = t("customer").join(
      t("orders").filter(col("o_orderpriority") =!= "5-LOW"),
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(dist.getOrElse(0L, 0L) == zeroCustomers)
  }

  test("q21: count-based waiting set equals the literal " +
    "EXISTS / NOT EXISTS formulation") {
    // the original Q21 semantics, expressed the expensive way: a late
    // (order, supplier) pair such that ANOTHER supplier shares the order
    // (EXISTS) and NO other supplier is late on it (NOT EXISTS)
    val lo = t("lineitem")
      .join(t("orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") +
          expr("INTERVAL 60 DAYS")).as("late"))
    val base = lo.filter(col("late"))
      .select("l_orderkey", "l_suppkey").distinct()
    val other = lo.select(col("l_orderkey").as("ok2"),
      col("l_suppkey").as("sk2"), col("late").as("late2"))
    val withOther = base.join(other,
      col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
      "left_semi")
    val noOtherLate = withOther.join(
      other.filter(col("late2")),
      col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
      "left_anti")
    val exists = noOtherLate
      .join(t("supplier")
          .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
          .join(t("region").filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("q_tpch_q21").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exists)
  }

  test("q11: threshold cut is sound and complete against an " +
    "independently-computed total") {
    val rows = q("q_tpch_q11").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val value = t("lineitem")
      .join(t("supplier")
          .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
          .join(t("region").filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
        .as("value_cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = value.values.sum
    val expected = value.filter { case (_, v) => v * 1000L > total }
    assert(rows == expected)
    assert(rows.nonEmpty)
  }

  test("q15: every returned supplier holds exactly the maximum revenue") {
    val rows = q("q_tpch_q15").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(2)).distinct
    assert(revs.length == 1)
    // no supplier outside the result set beats it
    val best = t("lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("c"))
      .agg(max("c")).collect()(0).getLong(0)
    assert(revs.head == best)
  }

  test("q2: each row's cost is the minimum over the part's EUROPE " +
    "suppliers") {
    val rows = q("q_tpch_q2").collect()
    assert(rows.nonEmpty)
    val minByPart = q("q_tpch_q2").groupBy("p_partkey")
      .agg(countDistinct(col("cost")).as("n"))
      .collect().map(_.getLong(1))
    // all rows for one part share the single minimal cost
    assert(minByPart.forall(_ == 1L))
  }

  test("q22: every dormant customer is strictly above the positive-" +
    "balance mean and has no post-2000 order") {
    val cutoff = lit("2000-01-01").cast("timestamp")
    val custs = t("customer")
      .join(t("orders").filter(col("o_orderdate") >= cutoff)
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .filter((col("c_nationkey") % 7).isin(0, 1, 2, 3))
    val pos = t("customer").filter(col("c_acctbal") > 0)
      .agg(sum(floor(col("c_acctbal") * 100).cast("long")),
        count(lit(1))).collect()(0)
    val (sumPos, nPos) = (pos.getLong(0), pos.getLong(1))
    val expected = custs
      .filter(floor(col("c_acctbal") * 100).cast("long") * nPos > sumPos)
      .groupBy((col("c_nationkey") % 7).cast("int").as("code"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = q("q_tpch_q22").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
