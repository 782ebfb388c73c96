ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "highload_kafka_streamsspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON. Two pieces of sbt chrome were defeating that (BENCH_r03 parsed:null):
// the logger's "[info] " prefix on forked-process output, and the trailing
// "[success] Total time: ..." line. Stream the child's stdio raw and drop
// the success banner so the bench total JSON is genuinely the last line.
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
  // 12g: the full 25-suite run accumulates localCheckpoint blocks from
  // the shared session; at 8g the tail suites' convergence collects
  // could hit memory pressure and flake (seen twice on GraphProps,
  // never reproducible in isolation or at 2000 ScalaCheck cases)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Dozens of whole-stage-codegen classes fill the default 240m JIT
  // code cache; once full the JIT disables and compute-heavy queries
  // (md5 minhash loops) run uncompiled, 3x slower.
  "-XX:ReservedCodeCacheSize=512m",
)
