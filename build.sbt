ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "timeseriesdatasslspark"
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
  // 226 whole-stage-codegen plans overflow the JVM's default 240 MB
  // JIT code cache mid-registry; once it fills, the compiler shuts
  // off and every later query runs interpreted (measured: the full
  // sf0.1 sweep reads 357 s with the default vs 257 s with 2g —
  // q196 23.7 -> 4.2, q174 11.0 -> 3.3, q197 7.6 -> 2.4). The
  // reservation is virtual address space, committed lazily, so the
  // only cost is when codegen actually needs it.
  "-XX:ReservedCodeCacheSize=2g",
)
