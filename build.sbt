ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gmallbiguanparentspark"
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
// Inherit sbt's raw stdout in forked runs instead of the default
// logger: the logger prefixes every line with "[info] ", which breaks
// downstream consumers that expect Bench's single JSON result line to
// start at column 0 (BENCH_r02/r03 both recorded parsed:null for
// exactly this reason).
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
  // 8g GC-thrashed under local[32]: 32 concurrent JSON render/parse
  // tasks intermittently blew a single query from ~2 s to 20-40 s
  // (the round-2 official 114 s display_explode stall was this same
  // signature). The bench box has 128 GiB; give the forked driver
  // enough old-gen that the suite never tips into full-GC churn.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 240m (the JDK17 default) fills on a 201-query board: every query
  // contributes whole-stage-codegen classes across warmup + 2 timed
  // reps, and once the reserve is tight the sweeper (UseCodeCacheFlushing,
  // on by default) silently evicts HOT compiled methods, which then
  // re-warm — the "JVM warmth" axis that swung same-code sections
  // 4.7× across r19/r20 sweeps and made late-running queries read
  // 2–3× their isolated cost. Reserved (virtual) only — committed on
  // demand, so the larger reserve costs nothing when unused.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
