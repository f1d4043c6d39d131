package graft

import java.nio.file.{Files, Paths}

/** Per-query plan dump for the round's before/after evidence:
  * `runMain graft.PlanDump <sfDir> <outDir> <tag> [query ...]` writes
  * `<outDir>/<query>_<tag>.txt` with the formatted explain (collected
  * first, so AQE's final plan is shown). Queries default to the bench set. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq else SparkEntry.benchQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect() // finalize AQE
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), formatted)
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally CacheTracker.releaseAll()
    }
    spark.stop()
  }
}
