package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-10 optimization evidence tool: dumps `.explain("formatted")` for
  * named queries to `plans/r10/<query>_<tag>.txt` so before/after plan
  * claims in OPTIMIZATION_r10.md are checkable without running Spark.
  *
  * Usage: `sbt "runMain graft.PlanDump <tag> q_a,q_b,..."`
  * (tag is typically `before` or `after`). Data dir from
  * SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale, so the plans
  * carry the same AQE-input statistics the bench sees); same session
  * shape as Bench (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq.empty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.BoundedWindow.silenceBoundedWindowWarning()
    val outDir = Paths.get("plans/r10")
    Files.createDirectories(outDir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(outDir.resolve(s"${name}_$tag.txt"), plan)
            println(s"[plandump] wrote plans/r10/${name}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
