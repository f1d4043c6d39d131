package graft


/** Dev helper: run a single registered query and show plan + rows.
  * Usage: runMain graft.RunOne <queryName> [sfDir] [explain] [conf:k=v ...]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc runtime confs for A/B splits, e.g. conf:spark.graft.merge.checkKeys=false
    args.filter(_.startsWith("conf:")).foreach { a =>
      val kv = a.stripPrefix("conf:").split("=", 2)
      spark.conf.set(kv(0), kv(1))
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    (1 to 3).foreach { it =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[runone] $name iter$it rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f sec")
    }
    if (args.contains("show")) df.show(20, truncate = false)
    spark.stop()
  }
}
