ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nutchspark"
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
// Forked stdout goes through raw, not behind sbt's "[info] " prefix —
// the driver json-parses Bench's final stdout line, and a prefixed
// line is not valid JSON.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Pin + pre-touch the heap: in this virtualized container, heap
  // GROWTH mid-query stalls the JVM on host page faults (observed: an
  // 8.3 s young-GC pause during a heap expand with only 5 GB live).
  // Committing and touching every page at JVM start moves that cost
  // into startup/warmup, where the bench doesn't time it.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  // 148 benched queries × whole-stage-codegen classes overflow the
  // default 240 MB JIT code cache; once flushing starts, a query's
  // compiled methods are evicted between its interleaved bench reps
  // and re-run interpreted/C1 (measured: ~2× total executor CPU,
  // 5× on explode-heavy queries, at similar wall). A 1 GB reserve
  // keeps every generated class C2-hot for the whole run.
  "-XX:ReservedCodeCacheSize=1g",
)
