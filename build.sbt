ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "telecoetlpipelinespark"
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs the whole "cluster" in one JVM: executor threads,
  // shuffle blocks, broadcasts and the block manager all share this
  // heap. 8g starves 32 threads (GC pressure inflated bench numbers
  // ~2x on shuffle-heavy queries); the image has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // every registry query generates fresh wholestage-codegen classes;
  // a 162-query bench run peaks ~152 MB of the 240 MB default code
  // cache (bench/diag_sf0.1.jsonl, r10). A full cache disables the
  // JIT for the REST of the run — the one identified mechanism that
  // matches the recurring q_star_fact_load full-sequence spike
  // profile (slow across all its reps, clean solo, nondeterministic).
  // Headroom is cheap; see BASELINE.md "star-fact spike adjudication".
  "-XX:ReservedCodeCacheSize=512m",
)
