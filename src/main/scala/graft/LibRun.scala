package graft


/** Dev helper: run a LIBRARY surface (an op that is deliberately not a
  * registered query — data-dependent shapes the SQL oracle cannot
  * express) and time it, RunOne-style. Currently: semdedup_scaled.
  * Usage: runMain graft.LibRun semdedup_scaled <sfDir> [targetOccupancy]
  */
object LibRun {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    what match {
      case "semdedup_scaled" =>
        val occ = if (args.length > 2) args(2).toInt else 200
        (1 to 3).foreach { it =>
          val t0 = System.nanoTime()
          val n = graft.operators.SimilarityOps.semDedupScaled(spark, sfDir, occ).count()
          println(f"[librun] semdedup_scaled occ=$occ iter$it rows=$n " +
            f"in ${(System.nanoTime() - t0) / 1e9}%.2f sec")
          CacheTracker.releaseAll()
        }
      case "topk_control" =>
        // the rank()-form twin of topk_heap_wide: RewriteRankLimit never
        // fires on rank (boundary ties), so this rides Spark's built-in
        // sort-based WindowGroupLimit path — the A/B control for the
        // bounded-heap operator (TopKPlanSpec proves row-identity)
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        (1 to 3).foreach { it =>
          val t0 = System.nanoTime()
          val n = Tables.lineitem(spark, sfDir)
            .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"))
            .withColumn("rn", rank().over(w))
            .filter(col("rn") <= 3)
            .count()
          println(f"[librun] topk_control iter$it rows=$n " +
            f"in ${(System.nanoTime() - t0) / 1e9}%.2f sec")
        }
      case other => sys.error(s"unknown library surface: $other")
    }
    spark.stop()
  }
}
