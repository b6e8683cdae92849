ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jlyflinkspark"
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
// forked run inherits this process's stdout directly — no "[info] "
// log prefix on program output, so the driver can parse Bench's JSON
// line from stdout as-is
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Embedded Derby is a JVM-wide singleton engine: when the two
// Derby-backed cdc suites shared the main test JVM with the whole
// parallel suite load, Derby's internals raced (observed as
// Derby-internal NPEs and, worse, one SILENT 2-of-3 partial batch
// apply in the exactly-once upsert spec). Structural fix: each
// Derby-backed suite runs in its OWN forked JVM (its own Derby
// engine + its own derby.system.home), so no other suite's Derby
// activity can ever be in flight. sbt's default concurrent
// restriction (Tags.ForkedTestGroup = 1) runs the groups serially.
val derbySuites = Set(
  "graft.cdc.ChangeArchiveJobSpec",
  "graft.cdc.ArchiveMainSpec",
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val base = (ThisBuild / baseDirectory).value
  val (derby, rest) = tests.partition(t => derbySuites.contains(t.name))
  val mainGroup = Tests.Group(
    "main", rest,
    Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  val derbyGroups = derby.map { t =>
    val home = base / "target" / "derby-home" / t.name
    Tests.Group(
      t.name, Seq(t),
      Tests.SubProcess(ForkOptions().withRunJVMOptions(
        opts :+ s"-Dderby.system.home=$home")))
  }
  mainGroup +: derbyGroups
}
