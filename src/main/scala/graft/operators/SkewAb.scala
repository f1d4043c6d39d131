package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B measurement for the triangle orientation's SKEW claim (backs
  * SCALING.md's r11 table): on a power-law graph with one hub of degree H,
  * id-ordered wedge enumeration puts the hub at the wedge CENTER when its
  * id sorts low — C(H, 2) wedges from one node — while degree-ordered
  * orientation points every hub edge INTO the hub (~0 hub wedges). The
  * near-uniform co-purchase graph the bench runs can't show this; the
  * synthetic hub is exactly where the O(m^1.5) argument matters.
  *
  * Usage: runMain graft.operators.SkewAb [hubDegree] [bgEdges]
  * (defaults 10000, 500000 — the id-ordered side enumerates ~5e7 wedges)
  */
object SkewAb {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val hubDeg = if (args.length > 0) args(0).toLong else 10000L
    val bgEdges = if (args.length > 1) args(1).toLong else 500000L
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // hub = node 0 (the LOWEST id — worst case for id-ordering, which
    // then orients every hub edge outward and enumerates C(H,2) wedges
    // at the hub); background = deterministic pseudo-random pairs over
    // nodes hubDeg+1 .. hubDeg+bgEdges/2 (avg degree ~4)
    val nBg = bgEdges / 2
    val hub = spark.range(1, hubDeg + 1).select(lit(0L).as("u"), col("id").as("v"))
    val bg = spark.range(bgEdges).select(
      (lit(hubDeg + 1) + pmod(col("id") * 2654435761L, lit(nBg))).as("a"),
      (lit(hubDeg + 1) + pmod(col("id") * 40503L + 11L, lit(nBg))).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val ue = hub.unionByName(bg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = ue.count()
    println(s"[skew] hubDeg=$hubDeg bgEdges=$bgEdges |E|=$m")

    // id-ordered wedge enumeration (the naive plan triangles() replaced):
    // wedges from each node's canonical out-edges, closure on the pair
    def idOrdered(e: DataFrame): (Long, Long) = {
      val o1 = e.select(col("u"), col("v").as("b"))
      val o2 = e.select(col("u"), col("v").as("c"))
      val wedges = o1.join(o2, "u").filter(col("b") < col("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nw = wedges.count()
      val closure = e.select(col("u").as("b"), col("v").as("c"))
      val tri = wedges.join(closure, Seq("b", "c")).count()
      wedges.unpersist(blocking = false)
      (nw, tri)
    }

    // degree-oriented wedge count (what triangles() enumerates)
    def orientedWedges(e: DataFrame): Long = {
      val o = GraphOps.orientByDegree(e)
      o.groupBy("src").agg(count(lit(1)).as("d"))
        .agg(sum(expr("d * (d - 1) DIV 2"))).first().getLong(0)
    }

    val ow = t("oriented wedge count")(orientedWedges(ue))
    // per-task payload bound evidence (r12 verdict item 8): the decorated
    // frame carries Σ(|N+u|+|N+v|) longs, so the scale question is the MAX
    // bytes any one task holds across the intersection stages — tracked as
    // max task shuffle-read bytes and max task peak execution memory over
    // the triangles() run at each hub decade
    val maxShuffleRead = new java.util.concurrent.atomic.AtomicLong(0)
    val maxPeakMem = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          maxShuffleRead.getAndAccumulate(
            m.shuffleReadMetrics.totalBytesRead, math.max(_, _))
          maxPeakMem.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val triOriented = t("degree-oriented triangles()")(
      GraphOps.triangles(ue).count())
    spark.sparkContext.removeSparkListener(listener)
    println(f"[skew] max task shuffle-read = ${maxShuffleRead.get / 1048576.0}%.1f MiB, " +
      f"max task peak exec mem = ${maxPeakMem.get / 1048576.0}%.1f MiB")
    graft.CacheTracker.releaseAll(blocking = true)
    val (iw, triId) = t("id-ordered enumeration")(idOrdered(ue))
    println(s"[skew] wedges: oriented=$ow id-ordered=$iw (${iw / math.max(ow, 1)}x)")
    println(s"[skew] triangles: oriented=$triOriented id-ordered=$triId " +
      s"agree=${triOriented == triId}")
    ue.unpersist()
    spark.stop()
  }
}
