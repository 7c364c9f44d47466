ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "csv2dbspark"
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
  // Also mirror the launcher's NON-add-opens defaults (measured
  // neutral here — the r15 bench-flap investigation A/B'd them — but
  // parity with spark-submit'd JVMs removes a whole class of
  // "harness vs shell" attribution questions):
  "-Djdk.reflect.useDirectMethodHandleAccessor=false",
  "-Dio.netty.tryReflectionSetAccessible=true",
  "-Dio.netty.allocator.type=pooled",
  "--enable-native-access=ALL-UNNAMED",
  "-XX:+IgnoreUnrecognizedVMOptions",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// The driver parses the bench run's LAST stdout line; sbt's
// "[success] Total time: ..." footer printed after graft.Bench's
// compact JSON summary is why BENCH_r12.json recorded parsed:null.
// Suppressing the success footer makes the JSON line the final one
// (failures still print "[error]" loudly and exit non-zero).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// ...and r13 showed that alone is not enough: sbt's logger still
// "[info] "-prefixes every forked-run stdout line, so the driver's
// json.loads on the tail's last line kept failing (BENCH_r13/r14
// parsed:null with the JSON line dead last). StdoutOutput inherits the
// forked JVM's stdout directly — no logger, no prefix, bare JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
