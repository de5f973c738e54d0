ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "buildamarketdataetlstrategybacktestingenginespark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// the bench headline. Forked-run output is normally routed through sbt's
// logger (prefixing every line with "[info] ") and sbt appends a
// "[success] Total time..." trailer — both broke strict last-line parsing
// (BENCH_r04 "parsed": null). Inherit raw stdout and drop the trailer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] with the whole bench's memoized caches needs headroom —
  // 8g showed broad ~25% GC inflation across warm queries on the
  // 128 GiB bench machine, and at 32g individual GC-sensitive rows
  // (the driver-iterated cluster loop, the stacked backtest) still
  // swung 2-3x between runs; 48g measured warm 53.6s with the
  // volatile rows stable (32g: 55.5-59.4s run-to-run)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // File-based GC log (stdout would break the driver's last-line bench
  // parser): when a bench row spikes (e.g. a warm row exceeding its own
  // cold row), grep this for a coincident pause instead of guessing
  // between heap pressure and external box load.
  s"-Xlog:gc*:file=${sys.env.getOrElse("SPARK_GRAFT_GC_LOG", "/tmp/graft_gc.log")}:time,uptime",
)
