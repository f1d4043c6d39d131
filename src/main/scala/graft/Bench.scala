package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries (SparkEntry.benchQueries)
  * against SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.benchQueries
    // warm-up: one full query (JVM/codegen startup) plus a count of every
    // table, so parquet footer reads, page-cache faults and the events
    // ns→µs rewrite are not billed to whichever query touches a table first
    SparkEntry.queries(names.head)(spark, sfDir).count()
    Tables.names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.table(spark, sfDir, t)
      df.count()
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch {
          case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: $t")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
