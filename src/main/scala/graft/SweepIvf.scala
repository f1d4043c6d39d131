package graft

/** Dev helper: recall@10 of the IVF probe pipeline per nprobe value.
  * Usage: runMain graft.SweepIvf [sfDir]
  */
object SweepIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    val brute = graft.operators.SimilarityOps.bruteForce(spark, sfDir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to graft.operators.SimilarityOps.KmeansK).foreach { np =>
      val ivf = graft.operators.SimilarityOps.ivfTopK(spark, sfDir, np)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & ivf).size.toDouble / brute.size
      println(f"[sweep] $sfDir nprobe=$np recall@10=$recall%.3f cand-frac~${np.toDouble / graft.operators.SimilarityOps.KmeansK}%.2f")
    }
    spark.stop()
  }
}
