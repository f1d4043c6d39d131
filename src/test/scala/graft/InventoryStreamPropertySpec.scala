package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (fixed-seed) differential test of the inventory stream's
  * ADMISSION CONTROL against a reference replay of the watermark
  * recurrence: for random trees with deliberately colliding mtimes and
  * random maxFilesPerTrigger bounds, driver-walk and distributed offset
  * modes must both produce EXACTLY the batch sequence the recurrence
  * defines — batch k's end watermark is the n-th smallest entry mtime
  * past batch k-1's (counting multiplicity, ties all admitted), every
  * entry in exactly the batch its mtime falls in. A split timestamp, a
  * dropped tie, a folder counted wrong, or a distributed merge that
  * disagrees with the driver heap all fail with the offending batch.
  */
class InventoryStreamPropertySpec extends AnyFunSuite {

  private def buildTree(rnd: scala.util.Random): (String, Seq[(String, Long)]) = {
    val root = Files.createTempDirectory("graft-sprop").toString
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val dirMtimes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def gen(dir: String, depth: Int): Unit = {
      (0 until 1 + rnd.nextInt(4)).foreach { i =>
        val rel = (if (dir == "/") "" else dir) + s"/f$i.dat"
        val mt = rnd.nextInt(9).toLong * 1000L // small domain: ties are common
        Files.write(Paths.get(root + rel), Array[Byte](1))
        Files.setLastModifiedTime(Paths.get(root + rel), FileTime.fromMillis(mt))
        entries += ((rel, mt))
      }
      if (depth < 2) {
        (0 until rnd.nextInt(3)).foreach { i =>
          val rel = (if (dir == "/") "" else dir) + s"/d$i"
          Files.createDirectories(Paths.get(root + rel))
          val mt = rnd.nextInt(9).toLong * 1000L
          entries += ((rel, mt))
          dirMtimes += ((rel, mt))
          gen(rel, depth + 1)
        }
      }
    }
    gen("/", 0)
    dirMtimes.sortBy(-_._1.length).foreach { case (rel, mt) =>
      Files.setLastModifiedTime(Paths.get(root + rel), FileTime.fromMillis(mt))
    }
    Files.setLastModifiedTime(Paths.get(root), FileTime.fromMillis(0L))
    (root, entries.toSeq)
  }

  /** the recurrence: batches of entries, each ended at the n-th smallest
    * mtime past the previous watermark, ties all admitted */
  private def replay(entries: Seq[(String, Long)], n: Int): Seq[Set[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
    var w = Long.MinValue
    var remaining = entries
    while (remaining.nonEmpty) {
      val past = remaining.filter(_._2 > w).sortBy(_._2)
      if (past.isEmpty) return out.toSeq
      val end = past(math.min(n, past.size) - 1)._2
      val batch = past.filter(_._2 <= end)
      out += batch.map(_._1).toSet
      w = end
      remaining = remaining.filter(_._2 > w)
    }
    out.toSeq
  }

  test("random trees × random bounds × both offset modes reproduce the watermark recurrence exactly") {
    val spark = TestSpark.spark
    val rnd = new scala.util.Random(815L)
    (1 to 6).foreach { tree =>
      val (root, entries) = buildTree(rnd)
      val n = Seq(1, 2, 3, 5)(rnd.nextInt(4))
      val expect = replay(entries, n)
      Seq(false, true).foreach { distributed =>
        val ckpt = Files.createTempDirectory("graft-sprop-ckpt").toString
        val out = Files.createTempDirectory("graft-sprop-out").toString + "/rows"
        val q = spark.readStream.format("graft-inventory").option("root", root)
          .option("maxFilesPerTrigger", n.toString)
          .option("distributedOffsets", distributed.toString).load()
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            batch.withColumn("batch", lit(id)).write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        val got = spark.read.parquet(out).collect()
          .map(r => (r.getLong(5), r.getString(0)))
          .groupBy(_._1).toSeq.sortBy(_._1)
          .map(_._2.map(_._2).toSet)
        assert(got == expect,
          s"tree=$tree n=$n distributed=$distributed\nexpect=$expect\ngot=$got")
      }
    }
  }
}
