ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "acuvatespark"
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
// The per-round bench driver parses the LAST stdout line as JSON;
// under sbt that line is the "[success] Total time" trailer, which is
// why BENCH_r10..r12 all carried "parsed": null even though
// graft.Bench prints its JSON as the final program line. Suppress the
// trailer so the program's own last line IS the process's last line.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// ... and forward the forked program's stdout VERBATIM (no "[info] "
// logger prefix): the driver parses the last stdout line as JSON, and
// a prefixed line may not parse depending on its parser
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
  // the container's default locale is C (ASCII): without a UTF-8
  // jnu encoding the JVM cannot CREATE files whose names carry
  // non-ASCII characters — which unicode partition values
  // (country=南) legitimately do under the hive layout (the escape
  // set covers only ASCII specials)
  "-Dsun.jnu.encoding=UTF-8", "-Dfile.encoding=UTF-8",
)
Test / envVars += ("LANG" -> "C.utf8")
run / envVars += ("LANG" -> "C.utf8")
