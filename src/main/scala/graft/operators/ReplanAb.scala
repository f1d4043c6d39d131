package graft.operators

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

/** A/B measurement for the per-batch REPLANNING cost under minPartitions
  * (backs SCALING.md's r11 note): the streaming source re-plans input
  * partitions once per micro-batch, and a fan-out floor makes planning
  * list the split levels on the driver each time — once for the bounded
  * offset walk and once for the batch plan. Is that material on a deep
  * drain, or is it noise against the per-batch reader walk every
  * listing-based incremental source pays anyway?
  *
  * Usage: runMain graft.operators.ReplanAb [topDirs] [subDirs] [filesPer]
  * (defaults 4 × 32 × 20 = 2560 files, maxFilesPerTrigger=64 → ~40
  * batches; prints total drain wall + directories listed for
  * minPartitions 1 vs 64 under distributedOffsets)
  */
object ReplanAb {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val topDirs = if (args.length > 0) args(0).toInt else 4
    val subDirs = if (args.length > 1) args(1).toInt else 32
    val filesPer = if (args.length > 2) args(2).toInt else 20

    def buildTree(): String = {
      val root = Files.createTempDirectory("graft_replan").toString
      var i = 0
      (0 until topDirs).foreach { t =>
        (0 until subDirs).foreach { s =>
          val dir = Paths.get(s"$root/top$t/sub$s")
          Files.createDirectories(dir)
          (0 until filesPer).foreach { f =>
            val p = dir.resolve(s"f$f.dat")
            Files.write(p, Array[Byte](1))
            Files.setLastModifiedTime(p, FileTime.fromMillis((i % 400).toLong * 1000L))
            i += 1
          }
        }
      }
      val it = Files.walk(Paths.get(root)).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (Files.isDirectory(p)) Files.setLastModifiedTime(p, FileTime.fromMillis(0L))
      }
      root
    }

    def drain(root: String, minParts: Int): (Double, Long, Long) = {
      import graft.sources.InventoryDataSource
      val ckpt = Files.createTempDirectory("graft_replan_ckpt").toString
      val out = Files.createTempDirectory("graft_replan_out").toString + "/rows"
      InventoryDataSource.dirsListed.set(0L)
      val t0 = System.nanoTime()
      val q = spark.readStream.format("graft-inventory").option("root", root)
        .option("maxFilesPerTrigger", "64")
        .option("distributedOffsets", "true")
        .option("admitFilesOnly", "true")
        .option("minPartitions", minParts.toString).load()
        .select("name", "is_folder")
        .filter(!col("is_folder"))
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batch.withColumn("batch", lit(id)).write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val batches = spark.read.parquet(out).agg(max("batch")).first().getLong(0) + 1
      (wall, InventoryDataSource.dirsListed.get(), batches)
    }

    println(s"[replan] tree: $topDirs x $subDirs x $filesPer = " +
      s"${topDirs * subDirs * filesPer} files")
    Seq(1, 64, 1, 64).zipWithIndex.foreach { case (mp, i) =>
      val (wall, listed, batches) = drain(buildTree(), mp)
      println(f"[replan] run$i minPartitions=$mp%-3d batches=$batches%-4d " +
        f"dirsListed=$listed%-7d wall=$wall%7.2f s " +
        f"(${listed.toDouble / batches}%.1f listings/batch)")
    }
    spark.stop()
  }
}
