ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "handsontrinoicebergsupersetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The Spark Connect JVM client (shaded) lives in the connect-repl subdir;
// only that jar is added (the rest is ammonite REPL tooling). Test-scoped:
// it is the CLIENT side of the wire-protocol endpoint spec.
Test / unmanagedJars += Attributed.blank(
  file("/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar"))
Test / fork := true
run / fork := true
// The bench/verify drivers parse the LAST stdout line as bare JSON.
// Forked run output defaults to LoggedOutput ("[info] " prefix) and sbt
// appends "[success] Total time: ..." after the main returns — both
// defeat that parse. Route forked stdout through unprefixed and drop
// the success/timing epilogue so graft.Bench's final println IS the
// final stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
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
  // 12g (was 8g through round 11): the round-12 bench warm phase keeps
  // every memo family's serving state resident through the whole timed
  // window — the storage pool needs the headroom or block eviction
  // bleeds into unrelated entries' readings (the q177 adjacency note,
  // BASELINE §Round 12)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
