ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "noaaetlspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // whole-stage codegen across ~90 queries + streaming overflows the
  // default 240m code cache; once full the JIT disables and interpreted
  // HOF paths degrade ~100x mid-suite
  "-XX:ReservedCodeCacheSize=1g",
  // ~90 queries flood the JIT with thousands of generated methods; at
  // the default 2-3 compiler threads the C2 queue backs up for minutes
  // and not-yet-compiled plans run interpreted ~30x slow. On 32 cores,
  // spend more of them on compilation.
  "-XX:CICompilerCount=12",
)
// Prune report XMLs for specs that no longer exist in src/test — a
// deleted (transient/debug) suite must not leave a stale red report
// that makes target/test-reports disagree with the live suite.
val pruneStaleTestReports = taskKey[Unit](
  "delete target/test-reports XMLs whose spec class is gone")
pruneStaleTestReports := {
  val live = (Test / definedTests).value.map(_.name).toSet
  val dir = target.value / "test-reports"
  IO.listFiles(dir, "TEST-*.xml").foreach { f =>
    val cls = f.getName.stripPrefix("TEST-").stripSuffix(".xml")
    if (!live.contains(cls)) IO.delete(f)
  }
}
Test / test := (Test / test).dependsOn(pruneStaleTestReports).value
