ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "priority_data_pipeline_azure_sql_dbspark"
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
// Forked run output goes straight to stdout — no "[info] " logger prefix,
// so Bench's single JSON result line stays machine-parseable.
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
// RAM-backed JVM tmp for forked runs when tmpfs is available: streaming
// checkpoints and temp sinks are fsync-heavy small-file I/O, and this
// box's virtual disk has intermittent multi-second flush stalls that
// otherwise land on whichever query is mid-write. tmpfs contents die with
// the machine, which is exactly the lifetime temp dirs want. (The Spark
// shuffle scratch moves the same way via spark.local.dir=H.scratchDir.)
val graftTmpDir: String = {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite) {
    val d = new java.io.File(shm, "graft-tmp"); d.mkdirs(); d.getAbsolutePath
  } else sys.props("java.io.tmpdir")
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Djava.io.tmpdir=$graftTmpDir",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
