package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's copy engine re-expressed on Spark's scheduler
  * (SURVEY.md §2.10, §3.3):
  *
  *  - op 33 phase barrier: directories created in depth order as a first
  *    action (parents before children), then files copied in a second —
  *    two ordered Spark jobs replace copy-to-adls.py:117-132.
  *  - op 32 work queue: `repartition(n).foreachPartition` replaces the
  *    10-thread queue.Queue fan-out (adls_copy_utils.py:106-145); Spark's
  *    task scheduler provides retry/locality for free.
  *  - op 34 error tolerance: failures become a `status` row in the returned
  *    quarantine DataFrame instead of the reference's silent skip (which
  *    could hang its queue.join barrier — copy-to-adls.py:93 note).
  *
  * At 100 TB the dirs action is tiny (directories ≪ files) and the files
  * action is embarrassingly parallel; parallelism = partitions, the
  * `-m`/`--max-parallelism` knobs of the reference.
  */
object CopyExecutor {

  final case class CopyResult(name: String, status: String, detail: String)

  /** 20 MiB — the reference's ranged-copy block size (copy-to-adls.py:24
    * BLOCK_SIZE; BASELINE.md constant). chunk_plan (PackingOps) is the
    * oracled schedule of exactly this loop's (offset, len) pairs. */
  val BlockSize: Long = 20L * 1024 * 1024

  /** The reference's copy inner loop (copy-to-adls.py:55-91), one file:
    * create the destination, then for each offset in range(0, length,
    * blockSize): ranged GET from the source → append at that position on
    * the destination, and finally flush at the total length. Runs inside
    * an executor task; returns the chunk count. */
  private def copyChunked(src: FileOps, dst: FileOps, name: String,
      totalLen: Long, blockSize: Long): Long = {
    dst.createFile(name)
    var off = 0L
    var chunks = 0L
    while (off < totalLen) {
      val n = math.min(blockSize, totalLen - off).toInt
      dst.append(name, off, src.readRange(name, off, n))
      off += n
      chunks += 1
    }
    dst.flush(name, totalLen)
    chunks
  }

  /** Copy an inventory (name, parent_directory, is_folder, owner, grp,
    * perms, length) into `ops`' namespace. Returns per-item status.
    *
    * With `source` set, file bytes are streamed through the chunked
    * ranged-read → append → flush loop above (the declared inventory
    * `length` drives the chunk schedule, exactly as the reference trusts
    * its inventory listing — copy-to-adls.py:64). Without a source (no
    * byte store to read from), a deterministic stub payload of
    * `length % 4096` bytes is written whole — the metadata/ACL/quarantine
    * path is identical either way. */
  def copyInventory(
      spark: SparkSession,
      inventory: DataFrame,
      ops: FileOps,
      parallelism: Int = 8,
      source: Option[FileOps] = None,
      blockSize: Long = BlockSize): DataFrame = {
    import spark.implicits._

    // phase 1: dirs, one DISTRIBUTED action per depth level, shallowest
    // first. Levels are a barrier (an action completes before the next
    // starts), so parents exist before children without any global order —
    // and within a level mkdirs are embarrassingly parallel. Only the
    // distinct depth values (~tree height, tens at most) reach the driver;
    // the dirs frame itself never does — at 100 TB / O(10M) directories
    // the old collect() here was a multi-GB driver array.
    val dirs = inventory.filter(col("is_folder"))
      .withColumn("depth", length(col("name")) - length(regexp_replace(col("name"), "/", "")))
      .select("depth", "name", "owner", "grp", "perms")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val depths = dirs.select("depth").distinct().as[Int].collect().sorted
    val dirResults = depths.map { d =>
      val level = dirs.filter(col("depth") === d)
        .select("name", "owner", "grp", "perms")
        .repartition(parallelism)
        .as[(String, String, String, String)]
        .mapPartitions { it =>
          it.map { case (name, owner, grp, perms) =>
            try {
              ops.mkdirs(name)
              ops.setOwnership(name, owner, grp, perms)
              CopyResult(name, "ok", "dir")
            } catch {
              case e: Exception => CopyResult(name, "failed", String.valueOf(e.getMessage))
            }
          }
        }
        .toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      level.count() // the per-level barrier: parents before children
      level
    }
    dirs.unpersist(blocking = false)

    // phase 2: files, partition-parallel
    val files = inventory.filter(!col("is_folder"))
      .select("name", "owner", "grp", "perms", "length")
    val fileResults = files
      .repartition(parallelism)
      .as[(String, String, String, String, Long)]
      .mapPartitions { it =>
        it.map { case (name, owner, grp, perms, len) =>
          try {
            val detail = source match {
              case Some(src) =>
                val chunks = copyChunked(src, ops, name, len, blockSize)
                s"file chunks=$chunks"
              case None =>
                // no byte store behind this inventory: deterministic stub
                // payload so the metadata path still lands real files
                ops.write(name, new Array[Byte]((len % 4096).toInt.max(1)))
                "file"
            }
            ops.setOwnership(name, owner, grp, perms)
            CopyResult(name, "ok", detail)
          } catch {
            case e: Exception => CopyResult(name, "failed", String.valueOf(e.getMessage))
          }
        }
      }
      .toDF()
      // materialize the side-effecting stage exactly once: without this,
      // every downstream action on the returned frame would re-run the
      // writes (benign for idempotent overwrites, wrong for append/flush
      // sinks); task-level retries remain idempotent-overwrite by design
      // (createFile truncates, so a retried file restarts from offset 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fileResults.count()

    dirResults.foldLeft(fileResults)(_ unionByName _)
  }

  final case class UnitRun(unit: Long, nPaths: Long, startMs: Long, endMs: Long)

  /** op 37 (distcp-to-databox.sh:27 `-async`): submit one copy job PER
    * UNIT and keep up to `maxInFlight` of them running concurrently on the
    * Spark scheduler — fire-and-forget from the submitting thread's view,
    * awaited together at the end. Each unit's job runs under its own job
    * group (cancelable per unit, visible per unit in the UI), the direct
    * analogue of one `-async` distcp submission per Data Box filelist.
    * Returns per-unit timing so callers (and the spec) can observe the
    * overlap. */
  def copyUnitsAsync(
      spark: SparkSession,
      assignments: DataFrame,
      ops: FileOps,
      maxInFlight: Int = 4): Seq[UnitRun] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    import spark.implicits._

    val units = assignments.filter(col("unit") =!= 0)
      .select(col("unit").cast("long")).distinct().as[Long].collect().sorted
    val pool = java.util.concurrent.Executors.newFixedThreadPool(maxInFlight.max(1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val inFlight = units.toSeq.map { u =>
        Future {
          spark.sparkContext.setJobGroup(s"graft-unit-$u",
            s"async copy of unit $u", interruptOnCancel = true)
          val t0 = System.currentTimeMillis()
          val n = assignments.filter(col("unit") === u)
            .select(col("path")).as[String].rdd
            .mapPartitions { it =>
              Iterator.single(it.map { p =>
                ops.write(s"$p/_copied", Array[Byte]('u')); 1L
              }.sum)
            }
            .sum().toLong
          val t1 = System.currentTimeMillis()
          spark.sparkContext.clearJobGroup()
          UnitRun(u, n, t0, t1)
        }
      }
      Await.result(Future.sequence(inFlight), Duration(600, "s"))
    } finally pool.shutdown()
  }

  /** op 14: partitioned filelist write — one text file per non-zero unit
    * (generate-file-list.py:68-72) */
  def writeFilelists(assignments: DataFrame, outDir: String): Unit =
    assignments.filter(col("unit") =!= 0)
      .select(col("unit"), col("path"))
      .repartition(col("unit"))
      .sortWithinPartitions("path")
      .write.mode("overwrite")
      .partitionBy("unit")
      .text(outDir)
}
