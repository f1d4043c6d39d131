package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering: the two-phase prefix-rank pattern
  * (range-partition on the sort key → rank locally → add broadcast
  * per-partition row-count offsets). Produces the same numbering as
  * `row_number().over(Window.orderBy(...))` without that form's
  * single-partition serialization — only the per-partition COUNTS (one
  * long per partition) ever reach the driver, so the pattern holds at any
  * row count.
  */
object TwoPhaseRank {

  /** append column `idxCol` = 1-based global row number by `sortCols`.
    * `numParts <= 0` follows the session's shuffle parallelism — the
    * numbering is identical for ANY partition count, so the choice is
    * purely about parallelism at the target scale. */
  def rowNumber(df: DataFrame, idxCol: String, numParts: Int, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = if (numParts > 0) numParts
                 else spark.sessionState.conf.numShufflePartitions
    // persist the input FIRST so repartitionByRange's boundary-sampling job
    // reads the cache instead of recomputing the upstream pipeline
    val input = df.persist()
    val ranged = input.repartitionByRange(nParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist() // pin partition assignment across the count and rank passes
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("n"))
      .orderBy("__pid").as[(Int, Long)].collect()
    // the counts action materialized `ranged`; the input cache is done.
    // `ranged` itself backs the returned (lazy) plan, so its release is
    // deferred to graft.CacheTracker.releaseAll() after the query's action.
    input.unpersist(blocking = false)
    graft.CacheTracker.track(ranged)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    val offDf = counts.map(_._1).zip(offsets.map(_._2)).toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    ranged
      .withColumn("__local", row_number().over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(idxCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** append column `outCol` = max of `valueCol` over all rows STRICTLY
    * before this one in `orderCol` (null when no such row) — the running
    * max a 2-D skyline needs, in the same two-phase shape as [[rowNumber]]:
    * range-partition on the order key, ROWS-frame window per partition,
    * broadcast per-partition maxima for the cross-partition prefix. Only
    * one max per partition reaches the driver. REQUIRES `orderCol` values
    * to be unique (range partitioning then guarantees earlier partitions
    * hold strictly smaller keys, and the per-partition 1-PRECEDING ROWS
    * frame is exactly the strict prefix) — dedupe first if not. */
  def prefixMaxDistinct(df: DataFrame, outCol: String, orderCol: Column,
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = spark.sessionState.conf.numShufflePartitions
    val input = df.persist()
    val ranged = input.repartitionByRange(nParts, orderCol)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val pmax = ranged.groupBy("__pid").agg(max(valueCol).as("m"))
      .orderBy("__pid").as[(Int, Long)].collect()
    input.unpersist(blocking = false)
    graft.CacheTracker.track(ranged)
    // prefix[pid] = max over all partitions BEFORE pid (null for the first)
    val prefix = pmax.scanLeft((0, Option.empty[Long])) {
      case ((_, acc), (pid, m)) => (pid, Some(acc.fold(m)(math.max(_, m))))
    }
    val offDf = pmax.map(_._1).zip(prefix.map(_._2))
      .map { case (pid, m) => (pid, m) }.toSeq.toDF("__pid", "__pref")
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__local", max(valueCol).over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, greatest(col("__local"), col("__pref")))
      .drop("__pid", "__local", "__pref")
  }
}
