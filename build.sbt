ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hippo_claim_crossoverspark"
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
// Forked run output normally routes through sbt's logger, which prefixes
// every stdout line with "[info] " — that prefix breaks any consumer doing
// json.loads on Bench's final summary line. StdoutOutput makes the forked
// JVM inherit the real stdout: raw, unprefixed, unbuffered-by-sbt.
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
  // The registry is ~120 queries; JDK 17's default 240 MB code cache fills
  // mid-sweep, the JIT flushes hot compiled methods (or stops compiling),
  // and later queries run partially interpreted — r4's cold pass measured
  // 317 s vs r3's 77 s with zero plan changes. 1 GB keeps every generated
  // class + JIT'd method resident for the whole sweep.
  "-XX:ReservedCodeCacheSize=1g",
)
