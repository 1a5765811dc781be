ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "readwisevectordbspark"
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
// The driver parses the bench's one-line JSON wire contract from the TAIL
// of `sbt "runMain graft.Bench"` output. The sbt logger broke that contract
// two ways for 16 rounds straight (BENCH_r01..r16 all record parsed:null):
// it prefixes the forked JVM's stdout with "[info] " (so no captured line
// starts with '{'), and it appends a "[success] Total time…" banner after
// main returns (so the wire line is never the last line). Pass the forked
// process's output through verbatim and drop the banner; the wire line is
// then the final stdout line of the sbt invocation. Exit codes unchanged.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint (its effect is verified: no [success] banner)
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench JVM holds ~2 GB of cached serving-store
  // relations (fp16 corpus + encoded store) across 3 timed passes of 53
  // queries; at 8g the later iterative queries ran under GC/execution-
  // memory pressure (q46-q50 measurably slower late in the run)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*=info:file=$f").toSeq
