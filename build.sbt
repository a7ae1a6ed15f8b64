ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "surospark"
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
// local-cluster[...] masters launch executor JVMs through the /opt/spark
// distribution's launcher, which needs the scala version that bin/
// load-spark-env.sh would normally export
run / envVars += ("SPARK_SCALA_VERSION" -> "2.13")
Test / envVars += ("SPARK_SCALA_VERSION" -> "2.13")
// executors launched by a local-cluster master take their shuffle-scratch
// roots from SPARK_LOCAL_DIRS (the cluster manager overrides
// spark.local.dir); point them at tmpfs like the in-process sessions do
run / envVars += ("SPARK_LOCAL_DIRS" ->
  sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark-scratch"))
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
// ClusterModeSpec needs a local-cluster SparkContext, and Spark allows one
// context per JVM while every other suite shares the local[4] session — so
// it runs in its own forked test JVM (same options/env as the main group).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
  val (cluster, rest) = tests.partition(_.name.endsWith("ClusterModeSpec"))
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(forkOpts)),
    Tests.Group("cluster", cluster, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // throughput collector: batch pipelines scale better across threads than
  // with default G1 (lower allocation-stall overhead in wide local mode)
  "-XX:+UseParallelGC",
)
