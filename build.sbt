ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataframepipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run/runMain output goes straight to this process's stdout/stderr
// instead of through sbt's logger: the Bench JSON contract line must be a
// raw stdout line (the logger's "[info] " prefix breaks line-oriented JSON
// parsing downstream).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs 32 concurrent tasks in ONE JVM: an 8g heap spent the
  // round-8 bench fighting GC (failed 1.9 GB page allocations in the x16
  // stress block) and understates every heavy window/aggregate. 24g on
  // the 125 GB box sizes the driver like a real deployment would.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // the generated-expression operators (PQ/kmeans codebook cascades,
  // LangId literal profiles) emit large codegen methods; the 240m
  // default code cache sweeps hot methods mid-suite
  "-XX:ReservedCodeCacheSize=512m",
  // GC log per forked JVM (VERDICT r9 #3): when a bench phase inflates
  // while CPU probes read fast, the log (plus the in-artifact gc_ms
  // snapshots) attributes it to co-tenant CPU theft vs heap pressure.
  // %p = pid, so concurrent forks never clobber each other.
  "-Xlog:gc:file=/tmp/graft_gc_%p.log:time,uptime",
)
