ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "databoxadlsloaderspark"
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
// Heap policy for forked run/test JVMs. This guest kernel makes
// FIRST-TOUCH of fresh heap pages pathologically slow, so a lazily-grown
// heap stalls mid-run every time G1 touches new pages (A/B-measured on
// the 21-query sf0.1 bench: 8g lazy 40s, 32g lazy 67s with the slowness
// migrating between queries run-to-run, 16g pre-touched 22s). The fix is
// to pay the page-touch cost ONCE at JVM startup: Xms=Xmx +
// -XX:+AlwaysPreTouch — but only at modest heap sizes, since pre-touch
// throughput here is ~200 MB/s and a 100g heap would take minutes to
// start. SPARK_GC_OPTS appends last, so experiments can still override
// everything (later JVM flags win).
// Pre-touch gating only needs a rough GiB estimate; any value this parse
// doesn't understand (fractional, exotic suffix) must still be a valid
// -Xmx string, so unparseable just means "assume huge, skip pre-touch" —
// never a build-load crash.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")
val driverMemGb: Int = {
  def gb(s: String, toGbShift: Int): Int =
    scala.util.Try(math.min(Int.MaxValue.toLong, s.toLong >> toGbShift).toInt)
      .getOrElse(Int.MaxValue)
  driverMem.toLowerCase match {
    case s if s.endsWith("t") =>
      scala.util.Try(
        math.min(Int.MaxValue.toLong, java.lang.Math.multiplyExact(s.dropRight(1).toLong, 1024L)).toInt)
        .getOrElse(Int.MaxValue)
    case s if s.endsWith("g") => gb(s.dropRight(1), 0)
    case s if s.endsWith("m") => gb(s.dropRight(1), 10)
    case s if s.endsWith("k") => gb(s.dropRight(1), 20)
    case s => gb(s, 30) // bare bytes
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
) ++ (if (driverMemGb <= 32) Seq(s"-Xms$driverMem", "-XX:+AlwaysPreTouch")
      else Seq.empty) ++
  sys.env.get("SPARK_GC_OPTS").toSeq.flatMap(_.split("\\s+"))
