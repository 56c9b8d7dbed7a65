ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "brahmandspark"
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
// Driver bench-parse contract: the compact one-line JSON that graft.Bench
// prints must be the FINAL, UNPREFIXED stdout line of `sbt "runMain ..."`.
// With the default LoggedOutput strategy sbt re-logs every forked-process
// line with an "[info] " prefix and then appends its own
// "[success] Total time: ..." footer — so the driver's last-line JSON parse
// recorded parsed:null in BENCH_r14..r17. StdoutOutput makes the forked JVM
// inherit stdout directly (no prefix); showSuccess := false drops the footer.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // 16g default: the 74-query bench runs a full dedup/ANN/GraphX sweep in
  // one JVM; at 8g the block manager starts evicting live caches mid-run
  // (observed: 2-4x inflation on the GraphX family). Box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ~220 codegen-heavy query executions per bench run emit thousands of
  // generated classes; the JVM default 240m code cache fills mid-run and
  // JIT compilation stops silently (uniform 2-10x inflation on whatever
  // runs after). Same setting Spark's own test harness uses.
  "-XX:ReservedCodeCacheSize=1g",
  // cap SQL UI listener retention: 74 queries x 3 iters of retained plan
  // descriptions (default 1000 executions) is pure heap pressure headless
  "-Dspark.sql.ui.retainedExecutions=25",
)
