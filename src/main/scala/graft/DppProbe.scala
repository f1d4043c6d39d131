package graft

import org.apache.spark.sql.functions._

/** Probe: does Spark inject a runtime (DPP) filter into the
  * graft-inventory scan when it's joined to a small directory dim?
  * Prints dirsListed with and without the join plus the physical plan
  * markers. Dev evidence for the SupportsRuntimeFiltering surface.
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.sources.InventoryDataSource

    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_dpp").toString
    (0 until 50).foreach { d =>
      val dir = Paths.get(s"$root/d$d")
      Files.createDirectories(dir)
      (0 until 20).foreach(f => Files.write(dir.resolve(s"f$f.dat"), Array[Byte](1)))
    }

    val inv = spark.read.format("graft-inventory").option("root", root).load()
    InventoryDataSource.dirsListed.set(0L)
    val full = inv.count()
    val fullListed = InventoryDataSource.dirsListed.get()

    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
    Seq("/d3", "/d7", "/zz").toDF("parent_directory").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter(col("parent_directory").startsWith("/d"))
    val j = spark.read.format("graft-inventory").option("root", root).load()
      .join(dim, "parent_directory")
    InventoryDataSource.dirsListed.set(0L)
    val rows = j.count()
    val joinListed = InventoryDataSource.dirsListed.get()
    println(s"[dpp] full=$full fullListed=$fullListed joinRows=$rows joinListed=$joinListed")
    val plan = j.queryExecution.executedPlan.toString
    println("[dpp] dynamicpruning in plan: " + plan.contains("dynamicpruning"))
    println("[dpp] RuntimeFilters marker: " +
      plan.linesIterator.filter(l => l.contains("RuntimeFilters") || l.contains("dynamicpruning")).take(3).mkString(" | "))
    spark.stop()
  }
}
