ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "movievectorsearchspark"
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
// Pass the forked process's stdout through verbatim: the default logger
// re-logs each line prefixed "[info] ", which breaks downstream JSON
// parsing of Bench's single-line machine-readable record.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // 113 bench queries x several WholeStageCodegen classes each overflow
  // the default 240m JIT code cache mid-run; HotSpot then stops JIT
  // compiling and late CPU-bound queries execute interpreted (measured
  // 3-4x: q79 6.3s in a fresh JVM vs 22-25s late in the bench). The
  // reserve should track suite growth, so 2g + an env knob at 119
  // queries. NOTE the r5 in-suite inflation episode (q79 ~21s in-suite
  // vs ~5s isolated, 2026-08-13) was A/B'd against this setting and is
  // NOT a code-cache recurrence — 1g and 2g measured the same, and the
  // identical r4 commit reproduced the inflation; see BASELINE.md
  // "Reading a bench artifact" for the attribution.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("GRAFT_CODE_CACHE", "2g")}",
  "-XX:+UseCodeCacheFlushing",
)
