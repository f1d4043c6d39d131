package graft.operators

import org.apache.spark.sql.functions._

/** Throwaway-style cost bisection for the scaled-IVF codebook build at a
  * given sf (backs SCALING.md's decade table for the Lloyd-refined
  * shape). Usage: runMain graft.operators.ScaledProbe <sfDir> */
object ScaledProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val sf = args(0)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val q = graft.Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("xq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t("count")(q.count())
    val k = math.max(2, math.ceil(n.toDouble / 50).toInt)
    println(s"[probe] n=$n k=$k")
    val cents = t("md5 sample collect") {
      q.withColumn("h", md5(col("vec_id").cast("string").cast("binary")))
        .orderBy("h", "vec_id").limit(k).select("xq")
        .collect().map(_.getSeq[Long](0).toArray).toVector
    }
    val asg = t("argmin count only") {
      q.select(graft.functions.CentroidArgmin.centroidArgmin(col("xq"), cents.toArray).as("c"))
        .groupBy("c").count().count()
    }
    println(s"[probe] distinct lists $asg")
    t("lloyd round (two-step)") {
      q.select(graft.functions.CentroidArgmin.centroidArgmin(col("xq"), cents.toArray).as("c"),
          col("xq"))
        .select(col("c"), posexplode(col("xq")).as(Seq("i", "x")))
        .groupBy("c", "i").agg(sum("x").as("s"), count(lit(1)).as("cnt")).count()
    }
    t("lloyd round (inline, 64x)") {
      q.select(graft.functions.CentroidArgmin.centroidArgmin(col("xq"), cents.toArray).as("c"),
          posexplode(col("xq")).as(Seq("i", "x")))
        .groupBy("c", "i").agg(sum("x").as("s"), count(lit(1)).as("cnt")).count()
    }
    if (args.contains("recall")) {
      val perQuery = graft.SparkEntry.queries("sim_ann_recall_scaled")(spark, sf)
        .collect().map(_.getLong(1))
      println(f"[probe] recall@10 (nprobe=6)  ${perQuery.sum.toDouble / (perQuery.length * 10)}%.3f" +
        s"  (n=${perQuery.length} queries, k=$k lists)")
    }
    spark.stop()
  }
}
