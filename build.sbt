ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pandasanalysiswithpostgresspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Second JDBC dialect (Postgres-flavored) for SourcesStateSpec: a DuckDB
// JDBC jar already sits in the pre-warmed local cache. Attach it as an
// unmanaged TEST-ONLY jar if (and only if) it is present — no new
// dependency resolution, offline-safe, and the dialect test assumes-away
// gracefully when the jar is absent.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier" / "v1"
  val found = if (cache.exists) (cache ** "duckdb_jdbc-*.jar").get() else Seq.empty
  found.take(1).map(Attributed.blank(_))
}
Test / fork := true
run / fork := true
// The driver parses graft.Bench's final JSON stdout line. sbt's default
// LoggedOutput strategy prefixes every forked-process line with "[info] ",
// which breaks a strict json.loads on the line (BENCH_r01/r02 both came
// back "parsed": null with the full line intact in the captured tail).
// StdoutOutput passes the forked JVM's stdout through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and suppress the trailing "[success] Total time" line so the JSON is
// the LAST line of the process output (robust whether the driver scans
// lines or takes only the final one).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
)
