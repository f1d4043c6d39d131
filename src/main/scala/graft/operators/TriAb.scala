package graft.operators

import org.apache.spark.sql.functions._

/** Stage-cost bisection for graph_triangles, the heaviest bench line
  * (backs SCALING.md's r11 note): where do the ~5 s at sf0.1 go —
  * edge build, orientation, the wedge self-join, or the closure probe?
  *
  * Usage: runMain graft.operators.TriAb [sfDir]
  */
object TriAb {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[triab] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val ue = li.as("l1").join(li.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_partkey") < col("l2.l_partkey"))
      .select(col("l1.l_partkey").as("u"), col("l2.l_partkey").as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = t("edge build + persist")(ue.count())
    println(s"[triab] |E|=$m")
    (1 to 2).foreach { round =>
      val oriented = GraphOps.orientByDegree(ue)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"r$round orientation persist")(oriented.count())
      val o1 = oriented.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
      val o2 = oriented.select(col("src"), col("dst").as("c"), col("ddst").as("dc"))
      val wedges = o1.join(o2, "src")
        .filter(col("db") < col("dc") || (col("db") === col("dc") && col("b") < col("c")))
      val nw = t(s"r$round wedge enumeration")(wedges.count())
      val closure = oriented.select(col("src").as("b"), col("dst").as("c"))
      val nt = t(s"r$round wedges + closure probe")(
        wedges.join(closure, Seq("b", "c")).count())
      println(s"[triab] r$round wedges=$nw triangles=$nt")
      val full = t(s"r$round full registered query")(
        graft.SparkEntry.queries("graph_triangles")(spark, sf).count())
      println(s"[triab] r$round per-node rows=$full")
      // B side: edge-centric adjacency intersection — for each oriented
      // edge (u,v), triangles = N+(u) ∩ N+(v); no wedge frame exists, so
      // nothing 40M-row is ever shuffled. The intersection is computed
      // BELOW the explode (one evaluation per edge, not per element).
      val adj = oriented.groupBy("src").agg(sort_array(collect_list("dst")).as("ns"))
      val triB = oriented.select(col("src"), col("dst"))
        .join(adj.select(col("src"), col("ns").as("nsrc")), "src")
        .join(adj.select(col("src").as("dst"), col("ns").as("ndst")), "dst")
        .select(col("src"), col("dst"),
          array_intersect(col("nsrc"), col("ndst")).as("inter"))
        .select(col("src"), col("dst"), explode(col("inter")).as("w"))
      val ntB = t(s"r$round B: adjacency intersect")(triB.count())
      println(s"[triab] r$round B triangles=$ntB agree=${ntB == nt}")
      oriented.unpersist(blocking = true)
      graft.CacheTracker.releaseAll(blocking = true)
    }
    spark.stop()
  }
}
