ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pandasetlframeworkspark"
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
// Pass the forked process's stdout straight through: the bench/verify
// mains print a machine-parsed JSON line that must not carry sbt's
// "[info] " logger prefix.
run / outputStrategy := Some(StdoutOutput)
// The bench harness parses the LAST stdout line as JSON; sbt's trailing
// "[success] Total time: …" line lands after the metric line and breaks
// that parse. Suppress it so the metric JSON is the final line.
Global / showSuccess := false
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
// Local-diagnosis knob (the driver never sets it): extra JVM flags for
// the forked run/test JVM, e.g. SPARK_GRAFT_JVM_EXTRA="-Xlog:safepoint"
// to chase scheduler/GC stalls in a bench run.
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
  .flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
