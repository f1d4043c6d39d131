package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Label propagation: correctness on a high-diameter graph plus the
  * storage-hygiene invariant the 100 TB posture depends on — superseded
  * rounds release their localCheckpoint blocks inside the loop (not at
  * the context cleaner's periodic GC), and the returned labels frame is
  * CacheTracker-released like every other per-query helper. */
class GraphOpsSpec extends AnyFunSuite with CacheDrained {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain + isolated-pair components are labeled by their minimum id") {
    // 0-1-2-...-16 chain (17 rounds of propagation at one hop per round)
    // plus a disjoint pair
    val chain = (0L until 16L).map(i => (i, i + 1))
    val pairs = (chain :+ (100L, 101L)).toDF("a", "b")
    val got = GraphOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    (0L to 16L).foreach(v => assert(got(v) == 0L, s"vertex $v"))
    assert(got(100L) == 100L && got(101L) == 100L)
    assert(got.size == 19)
  }

  test("checkpoint blocks do not accumulate with round count") {
    val sc = spark.sparkContext
    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val before = persistedIds
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    val labeled = GraphOps.connectedComponents(chain)
    labeled.count()
    // ~20 propagation rounds ran; without the in-loop release every
    // round's checkpoint would still be persistent here. Live blocks:
    // the final labels checkpoint, plus possibly the edge cache whose
    // release is non-blocking.
    val live = persistedIds -- before
    assert(live.size <= 2, s"leaked ${live.size} persistent RDDs: $live")
    // the harness's releaseAll (blocking) frees the final checkpoint too
    CacheTracker.releaseAll(blocking = true)
    val after = persistedIds -- before
    assert(after.forall(id =>
        sc.getPersistentRDDs.get(id).forall(_.getStorageLevel == StorageLevel.NONE)),
      s"blocks survived releaseAll: $after")
  }
}
