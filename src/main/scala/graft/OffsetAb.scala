package graft

import org.apache.spark.sql.functions._

/** A/B of the inventory stream's BOUNDED offset walk (SCALING.md r10):
  * driver-local bounded heap vs distributed per-subtree top-n heads, on a
  * tree wide enough that the per-batch listing cost is visible. Builds a
  * dirs × filesPerDir fixture with striped deterministic mtimes (so a
  * maxFilesPerTrigger drain takes many batches — each batch pays one
  * offset walk), then drains once per mode through the same
  * foreachBatch sink and prints one JSON line per mode with the wall
  * time, batch count, and the driver-listing observables. On local[N]
  * both modes do the same TOTAL listing work on one machine, so the
  * local win is the fan-out parallelism; the structural win — the
  * driver listing nothing but the root, which is what matters when the
  * driver is one node against a billion-file namespace — shows in
  * driverWalkDirs = 0.
  *
  * Usage: runMain graft.OffsetAb [dirs] [filesPerDir] [maxFilesPerTrigger]
  */
object OffsetAb {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.length > 0) args(0).toInt else 200
    val fpd = if (args.length > 1) args(1).toInt else 100
    val mft = if (args.length > 2) args(2).toInt else 2000
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")

    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val root = Files.createTempDirectory("graft_offset_ab").toString
    (0 until dirs).foreach { d =>
      val dir = Paths.get(s"$root/d$d")
      Files.createDirectories(dir)
      (0 until fpd).foreach { f =>
        val p = dir.resolve(s"f$f.dat")
        Files.write(p, Array[Byte](1))
        // striped mtimes: batch k admits the k-th stripe across ALL dirs,
        // so every batch's walk touches the whole tree (worst case)
        Files.setLastModifiedTime(p, FileTime.fromMillis((f.toLong * dirs + d) * 1000L))
      }
      Files.setLastModifiedTime(dir, FileTime.fromMillis(0L))
    }
    Files.setLastModifiedTime(Paths.get(root), FileTime.fromMillis(0L))

    def drain(distributed: Boolean): (Double, Long, Long, Long) = {
      import graft.sources.InventoryDataSource
      val ckpt = Files.createTempDirectory("graft_offset_ab_ckpt").toString
      InventoryDataSource.driverWalkDirs.set(0L)
      InventoryDataSource.dirsListed.set(0L)
      val batches = new java.util.concurrent.atomic.AtomicLong(0L)
      val t0 = System.nanoTime()
      val q = spark.readStream.format("graft-inventory").option("root", root)
        .option("maxFilesPerTrigger", mft.toString)
        .option("distributedOffsets", distributed.toString).load()
        .filter(!col("is_folder"))
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (batch.count() > 0) batches.incrementAndGet()
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      ((System.nanoTime() - t0) / 1e9, batches.get(),
        InventoryDataSource.driverWalkDirs.get(), InventoryDataSource.dirsListed.get())
    }

    Seq(false, true).foreach { dist =>
      val (s, b, dw, dl) = drain(dist)
      println(f"""{"mode":"${if (dist) "distributed" else "driver"}","dirs":$dirs,"files":${dirs * fpd},"maxFilesPerTrigger":$mft,"drain_s":$s%.2f,"batches":$b,"driverWalkDirs":$dw,"dirsListed":$dl}""")
    }
    spark.stop()
  }
}
