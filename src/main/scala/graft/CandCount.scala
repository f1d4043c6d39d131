package graft


/** Dev/scaling helper: count near-dup LSH candidate pairs and verified
  * pairs at a scale factor and threshold — the candidate-growth evidence
  * SCALING.md records across sf decades.
  * Usage: runMain graft.CandCount <sfDir> [candsonly] [tau...]
  * `candsonly` skips the verified-pairs pass (half the work — the
  * candidate fraction is the scaling-decade evidence; pairs need a
  * second full pass over the candidate join).
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val candsOnly = args.contains("candsonly")
    // flag-aware positional parse: the first non-flag arg is the sfDir,
    // the rest are taus — so `CandCount candsonly` works on the default dir
    val positional = args.filterNot(_ == "candsonly")
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.01")
    val taus = {
      val t = positional.drop(1).map(_.toDouble).toSeq
      if (t.nonEmpty) t else Seq(0.4, 0.8)
    }
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.Tables.embeddings(spark, sfDir).count()
    taus.foreach { tau =>
      val plan = graft.operators.SimilarityOps.nearDupPlan(tau, n)
      val cands = graft.operators.SimilarityOps.nearDupCandidates(spark, sfDir, tau).count()
      val pairs =
        if (candsOnly) -1L
        else graft.operators.SimilarityOps.nearDupPairsAt(spark, sfDir, tau).count()
      println(f"[candcount] sf=$sfDir n=$n tau=$tau tables=${plan.tables} bits=${plan.bits} " +
        f"candidates=$cands pairs=$pairs cand_frac=${cands.toDouble / (n.toDouble * (n - 1) / 2)}%.4f")
    }
    spark.stop()
  }
}
