package graft

import org.apache.spark.sql.functions._

/** A/B of the inventory scan's partition fan-out on a TOP-HEAVY namespace
  * (SCALING.md r10): `topDirs` top-level directories each hiding
  * `subDirs × filesPerDir` files. The default plan gets topDirs+1 tasks
  * no matter what sits beneath; `.option("minPartitions", n)` splits
  * breadth-first. Prints one JSON line per mode with the wall time of a
  * full files-only aggregate and the observed partition count.
  *
  * Usage: runMain graft.ScanAb [topDirs] [subDirs] [filesPerDir] [minPartitions]
  */
object ScanAb {
  def main(args: Array[String]): Unit = {
    val topDirs = if (args.length > 0) args(0).toInt else 2
    val subDirs = if (args.length > 1) args(1).toInt else 200
    val fpd = if (args.length > 2) args(2).toInt else 50
    val minParts = if (args.length > 3) args(3).toInt else 64
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_scan_ab").toString
    (0 until topDirs).foreach { t =>
      (0 until subDirs).foreach { d =>
        val dir = Paths.get(s"$root/top$t/d$d")
        Files.createDirectories(dir)
        (0 until fpd).foreach { f =>
          Files.write(dir.resolve(s"f$f.dat"), Array[Byte](1, 2, 3))
        }
      }
    }

    def run(min: Option[Int]): (Double, Int, Long) = {
      val r0 = spark.read.format("graft-inventory").option("root", root)
      val reader = min.fold(r0)(n => r0.option("minPartitions", n.toString))
      val df = reader.load().filter(!col("is_folder"))
        .agg(count(lit(1)), sum("length"))
      // partition count from the executed scan RDD
      val t0 = System.nanoTime()
      val row = df.collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val nparts = reader.load().rdd.getNumPartitions
      (secs, nparts, row.getLong(0))
    }
    // warm the FS cache once so the A/B compares plans, not page cache
    run(None)
    Seq(None, Some(minParts)).foreach { m =>
      val (s, p, n) = run(m)
      println(f"""{"mode":"${m.fold("default")(x => s"minPartitions=$x")}","files":$n,"scan_s":$s%.2f,"partitions":$p}""")
    }
    spark.stop()
  }
}
