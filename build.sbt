ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cyborgdbencryptedvectorsearchspark"
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
  // keep catalog tables (bucketing tests) out of the repo tree
  "-Dspark.sql.warehouse.dir=/tmp/graft_warehouse",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The test suite's scratch (every spec's temp index trees, Spark block
// manager dirs, staged dynamic-partition writes) lives under target/, NOT
// the host /tmp: the r14 driver run died mid-suite with `Mkdirs failed to
// create file:/tmp/...` — a host-environment failure (/tmp is shared with
// whatever else the box runs, and on many hosts is a small tmpfs) that a
// 30-minute 370-test run must not be hostage to. Created right before the
// forked JVM starts (Tests.Setup survives a preceding `clean`).
Test / javaOptions ++= {
  val tmp = (target.value / "tmp").getAbsolutePath
  Seq(s"-Djava.io.tmpdir=$tmp", s"-Dspark.local.dir=$tmp",
    s"-Dspark.sql.warehouse.dir=$tmp/graft_warehouse")
}
// The warehouse must start EMPTY with the fresh in-memory catalog every
// test-JVM run: managed tables (BucketingSpec) leave their data dirs
// behind while the catalog that knew them dies with the JVM, so the next
// run's CREATE TABLE hits LOCATION_ALREADY_EXISTS — a latent collision at
// any warehouse path (the old /tmp/graft_warehouse had it too; it only
// never fired because each sandbox ran the suite once).
Test / testOptions += Tests.Setup { () =>
  IO.delete(target.value / "tmp" / "graft_warehouse")
  IO.createDirectory(target.value / "tmp")
}
