package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-independence: the engine's correctness story leans on
  * every registered query being a pure function of the DATA, not of the
  * physical plan — integer arithmetic instead of float reduction orders,
  * total-order tiebreaks under every window, floor-mean centroids. This
  * spec attacks that claim directly: run order-sensitive queries under a
  * deliberately hostile shuffle layout (7 partitions instead of 32, so
  * every hash bucket, partial-agg order, and merge order changes) and
  * require bit-identical results. A query that silently depends on
  * partition count would pass its DuckDB oracle on the driver's layout
  * and still be wrong on a 1000-executor cluster — this is the test that
  * catches it locally. */
class DeterminismSpec extends AnyFunSuite with CacheDrained {

  /** queries whose pipelines carry the most order-sensitivity risk:
    * float scores (ANN sims), iterated models (k-means, pagerank),
    * distributed prefix ranks, windowed dedup, and sketch cells */
  private val Sensitive = Seq(
    "dedup_minhash", "sim_semdedup", "sim_ann_hybrid", "sim_ann_ivfpq",
    "train_shuffle_order", "graph_pagerank", "events_count_min",
    "text_strip_boilerplate", "prof_key_skew", "tpch_q21")

  private def canonical(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(TestSpark.spark, TestSpark.Sf)
    // row-order independent canonical form: every row rendered then sorted
    df.collect().map(_.toString).sorted.toSeq
  }

  test("order-sensitive queries are bit-identical under a hostile shuffle layout") {
    val spark = TestSpark.spark
    val conf = spark.conf
    val saved = conf.get("spark.sql.shuffle.partitions")
    val baseline = Sensitive.map(q => q -> canonical(q)).toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      // drop the tracked persisted frames so shuffle-consuming stages
      // re-execute under the 7-partition layout. The driver-side memoized
      // MODELS (k-means / PQ codebooks, frequent-line sets) survive by
      // design — their partition-independence is already proven by the
      // DuckDB oracles, which rebuild them from scratch in SQL; this test
      // covers every stage downstream of them.
      CacheTracker.releaseAll()
      Sensitive.foreach { q =>
        val again = canonical(q)
        assert(again == baseline(q),
          s"$q changed results under a different shuffle partitioning " +
            s"(${baseline(q).size} vs ${again.size} rows; first diff: " +
            s"${baseline(q).zipAll(again, "<missing>", "<missing>")
              .find { case (a, b) => a != b }})")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", saved)
      CacheTracker.releaseAll()
    }
  }
}
