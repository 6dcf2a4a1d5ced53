ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bolsonspark"
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
// Forked run output goes straight to stdout/stderr, NOT through sbt's
// logger: the driver parses graft.Bench's one-line JSON from stdout, and
// the "[info] " prefix sbt's logger adds breaks that parse (round-1
// BENCH came back parsed:null for exactly this reason).
run / outputStrategy := Some(StdoutOutput)
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
  // Arrow's netty allocator needs reflective access on JDK 17 (spark-submit
  // sets this too, via JavaModuleOptions)
  "-Dio.netty.tryReflectionSetAccessible=true",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- non-default `adapters` module: the Pulsar vendor adapter,
// compile-gated so the doc/pulsar-adapter.md snippet can never rot.
// `sbt adapters/compile` type-checks graft.streaming.pulsar against the
// api-shim facade (the zero-egress sandbox cannot resolve the real
// pulsar-client jar; production drops the shim dir and adds the jar —
// see adapters/api-shim/.../shim.scala). Root is defined explicitly so
// plain `sbt compile` / `sbt test` do NOT aggregate this module.
lazy val root = (project in file("."))

lazy val adapters = (project in file("adapters"))
  .dependsOn(root)
  .settings(
    name := "graft-adapters",
    unmanagedBase := file("/opt/spark/jars"),
    Compile / unmanagedSourceDirectories +=
      baseDirectory.value / "api-shim" / "src" / "main" / "scala",
  )
