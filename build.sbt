ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbannsearchspark"
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
// The driver parses the LAST raw stdout line of `sbt -batch "runMain
// graft.Bench"` as JSON (BENCH_r{N}.json `parsed` field). Two sbt logger
// behaviors break that: forked output is re-logged with an "[info] " prefix,
// and a "[success] Total time ..." line trails the JSON. Route forked run
// output straight through and drop the success banner so the bench compact
// line is the process's true last stdout line.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // SIMD distance kernels (graft.core.SimdKernels); Simd falls back to
  // scalar loops when the module flag is absent (e.g. spark-submit without
  // extraJavaOptions), so this is a fast path, not a hard requirement.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Xms=Xmx + pre-touch: with a large lazily-committed heap, G1 spreads
  // allocation over fresh regions and the hot loop pays kernel first-touch
  // page faults continuously (measured on the 100x smoke's minhash op,
  // 32 threads: 64g heap un-pretouched ran 54-280 s with 15m SYS time vs
  // 1m17s at 8g; pre-touched 64g runs 24 s, faster than 8g). Same flags a
  // production Spark executor should carry (spark.executor.extraJavaOptions).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
) ++
  // extra JVM flags for profiling runs (e.g. SPARK_JVM_OPTS="-Xlog:gc" to
  // attribute wall-time anomalies to collector behavior) — space-separated
  sys.env.get("SPARK_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq.filter(_.nonEmpty))
Compile / javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
