ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ragprojectwithembeddingsandvectordatabasespark"
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
// Pass the forked process's stdout through untouched: sbt's default
// logger prefixes every line with "[info] ", which breaks machine
// parsing of Bench's single-line JSON output.
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
  // 50+ distinct queries × whole-stage codegen overflow the default
  // 240m code cache; once full the JIT silently stops compiling and
  // hot typed lambdas run interpreted (measured 3-5x slowdowns late
  // in a bench run)
  "-XX:ReservedCodeCacheSize=1g",
  // Spark's generated-class cache (StaticSQLConf CODEGEN_CACHE_MAX_ENTRIES)
  // defaults to 100 entries; a 70+-query bench generates several hundred
  // distinct codegen sources, so consecutive passes evict freshly JIT'd
  // classes and recompile them — codegen-heavy queries then run partly
  // interpreted (the round-3 "unchanged code got 2x slower" regression).
  // Static conf: must be set before the first SparkSession, hence here.
  "-Dspark.sql.codegen.cache.maxEntries=4096",
)
