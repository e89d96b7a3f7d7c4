ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "myasynstreamjoinspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage-codegen compile cache (static JVM-wide conf; default 100
  // entries). The 190-query suite cycles thousands of distinct codegen
  // units per bench run, so at the default every run evicted and
  // re-Janino-compiled EVERY unit: measured on the dedup family bench,
  // raising the cache took the family 11.6 s -> 7.9 s (d_jaccard_prefix
  // _pairs 1.82 -> 0.76 s) with identical plans. The same churn hits any
  // production driver/executor running a many-query workload; entries are
  // small generated classes, so the memory cost is a few hundred MB at
  // worst. Env-overridable like the heap.
  s"-Dspark.sql.codegen.cache.maxEntries=${sys.env.getOrElse("SPARK_CODEGEN_CACHE_ENTRIES", "5000")}",
)
