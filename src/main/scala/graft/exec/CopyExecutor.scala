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

  /** Copy an inventory (name, parent_directory, is_folder, owner, grp,
    * perms, length) into `ops`' namespace. Returns per-item status. */
  def copyInventory(
      spark: SparkSession,
      inventory: DataFrame,
      ops: FileOps,
      parallelism: Int = 8): DataFrame = {
    import spark.implicits._

    // phase 1: dirs, shallowest first, sequential on the driver (cheap:
    // dirs ≪ files) — mirrors the reference's sequential dir phase
    val dirs = inventory.filter(col("is_folder"))
      .withColumn("depth", length(col("name")) - length(regexp_replace(col("name"), "/", "")))
      .orderBy("depth", "name")
      .select("name", "owner", "grp", "perms")
      .collect()
    val dirResults = dirs.map { r =>
      try {
        ops.mkdirs(r.getString(0))
        ops.setOwnership(r.getString(0), r.getString(1), r.getString(2), r.getString(3))
        CopyResult(r.getString(0), "ok", "dir")
      } catch {
        case e: Exception => CopyResult(r.getString(0), "failed", e.getMessage)
      }
    }

    // phase 2: files, partition-parallel
    val files = inventory.filter(!col("is_folder"))
      .select("name", "owner", "grp", "perms", "length")
    val fileResults = files
      .repartition(parallelism)
      .as[(String, String, String, String, Long)]
      .mapPartitions { it =>
        it.map { case (name, owner, grp, perms, len) =>
          try {
            // content stub: the real engine streams ranged chunks
            // (PackingOps.chunk_plan is the chunk schedule); here we
            // materialize a deterministic payload of the declared length
            val content = new Array[Byte]((len % 4096).toInt.max(1))
            ops.write(name, content)
            ops.setOwnership(name, owner, grp, perms)
            CopyResult(name, "ok", "file")
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fileResults.count()

    spark.createDataFrame(dirResults.toIndexedSeq).unionByName(fileResults)
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
