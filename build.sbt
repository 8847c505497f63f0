ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "econdatapipelinespark"
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
// The driver parses Bench's stdout for one raw JSON line; sbt's default
// LoggedOutput prefixes every forked-process line with "[info] ", which
// breaks that parse. StdoutOutput passes the child's stdout through as-is.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
)
// Heap per forked scope (SPARK_DRIVER_MEM overrides both): the run mains
// (Bench/Verify/Probe) are sized for the 128 GiB local[32] bench host —
// measured 71.5s -> 68.9s at sf0.1 going 8g -> 24g; the test suite stays
// at 8g so `sbt test` remains runnable on an ordinary dev machine.
Compile / run / javaOptions +=
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
Compile / runMain / javaOptions +=
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
Test / javaOptions +=
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
