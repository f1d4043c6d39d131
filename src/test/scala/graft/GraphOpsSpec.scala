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

  test("driver CC fast path streams each canonical pair ONCE, never the doubled edge list") {
    // the r10 fast path collected the bidirectional frame (2x the pairs);
    // the streamed union-find must see exactly one row per undirected pair
    val pairs = Seq((7L, 3L), (3L, 9L), (20L, 21L), (40L, 41L), (41L, 42L))
      .toDF("a", "b")
    val got = GraphOps.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 3L, 3L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L,
      40L -> 40L, 41L -> 40L, 42L -> 40L), s"labels drifted: $got")
    assert(GraphOps.driverCcPairsSeen.get() == 5L,
      s"driver saw ${GraphOps.driverCcPairsSeen.get()} rows for 5 pairs — " +
        "the fast path must stream canonical pairs, not the doubled edges")
  }

  test("linkPredict: scores non-adjacent pairs by shared-neighbor 1/log2 mass") {
    // square 1-2-3-4-1 plus a pendant 5 on node 1: degrees 3,2,2,2,1 →
    // per-hinge contributions 500000 (bits 2) and 1000000 (bits 1)
    val ue = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    val got = GraphOps.linkPredict(ue)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (x, y, cn, aa) => (x, y) -> ((cn, aa)) }.toMap
    assert(got == Map(
      (1L, 3L) -> ((2L, 1000000L)), // via 2 and 4, both degree 2
      (2L, 4L) -> ((2L, 1000000L)), // via 1 (deg 3) and 3 (deg 2)... both bits=2
      (2L, 5L) -> ((1L, 500000L)),  // via the hub 1 only
      (4L, 5L) -> ((1L, 500000L))), s"got $got")
  }

  test("kCore: clique survives, tail peels in cascade, core degrees are in-core") {
    // K4 on 0..3 (3-core) with a path 3-10-11-12 hanging off: the path
    // peels over THREE successive rounds (12 first — degree 1 — then 11,
    // then 10), exercising the cascade, and the clique alone survives
    val clique = for { i <- 0 until 4; j <- i + 1 until 4 } yield (i.toLong, j.toLong)
    val tail = Seq((3L, 10L), (10L, 11L), (11L, 12L))
    val got = GraphOps.kCore((clique ++ tail).toDF("u", "v"), k = 3, maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L), s"core nodes: $got")
    // degree INSIDE the core: node 3's tail edge must not count
    got.foreach { case (n, d) => assert(d == 3L, s"node $n in-core degree $d != 3") }
    // k above the max core: everything peels, result is empty not an error
    val empty = GraphOps.kCore(clique.toDF("u", "v"), k = 4, maxRounds = 10).collect()
    assert(empty.isEmpty)
  }

  test("labelPropagation: two dense cliques joined by one bridge split into two communities") {
    // K5 on 0..4 and K5 on 10..14, bridged by (4, 10): every node's
    // neighbors are dominated by its own clique, so 4 rounds settle each
    // clique on its min label and the bridge cannot flip either side
    def clique(base: Long) = for {
      i <- 0 until 5; j <- i + 1 until 5
    } yield (base + i, base + j)
    val pairs = (clique(0) ++ clique(10) :+ (4L, 10L)).toDF("u", "v")
    val got = GraphOps.labelPropagation(pairs, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 10)
    val left = (0L to 4L).map(got).toSet
    val right = (10L to 14L).map(got).toSet
    assert(left.size == 1 && right.size == 1 && left != right,
      s"cliques not separated: $got")
  }

  test("labelPropagation: communities never cross connected components, " +
    "and the result is partition-independent") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, TestSpark.Sf).select("l_orderkey", "l_partkey")
    val ue = li.as("l1").join(li.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_partkey") < col("l2.l_partkey"))
      .select(col("l1.l_partkey").as("u"), col("l2.l_partkey").as("v"))
      .distinct()
    val comm = GraphOps.labelPropagation(ue, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val comp = GraphOps.connectedComponents(
        ue.select(col("u").as("a"), col("v").as("b")))
      .as[(Long, Long)].collect().toMap
    // every pair sharing a community shares a component
    comm.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(comp).toSet.size == 1,
        "a community spans connected components")
    }
    val rep = GraphOps.labelPropagation(ue.repartition(13), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(rep == comm, "result depends on input partitioning")
  }

  test("checkpoint blocks do not accumulate with round count") {
    val sc = spark.sparkContext
    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val before = persistedIds
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    // force the DISTRIBUTED loop (~20 rounds): the driver fast path would
    // otherwise run zero rounds and this hygiene test would pass trivially
    spark.conf.set(graft.operators.GraphOps.CcPairCapKey, "0")
    val labeled =
      try GraphOps.connectedComponents(chain)
      finally spark.conf.unset(graft.operators.GraphOps.CcPairCapKey)
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

  test("distributed loop and driver fast path label identically (forced-loop differential)") {
    // the fast path made every long-id test graph take the union-find
    // route; this differential keeps the distributed loop itself covered
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.distinct
      .toDF("a", "b")
    val fast = GraphOps.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    CacheTracker.releaseAll(blocking = true)
    spark.conf.set(graft.operators.GraphOps.CcPairCapKey, "0")
    val loop =
      try GraphOps.connectedComponents(pairs).as[(Long, Long)].collect().toMap
      finally spark.conf.unset(graft.operators.GraphOps.CcPairCapKey)
    assert(loop == fast,
      s"loop and fast path diverged; only-loop=${loop.toSet -- fast.toSet} " +
        s"only-fast=${fast.toSet -- loop.toSet}")
  }

  test("triangles: degree-ordered enumeration equals the known triangle set") {
    // 4-clique {0,1,2,3} (4 triangles) + star center 10 with leaves
    // 11..15 (hub, no triangles) + one triangle {20,21,22} sharing no
    // vertex with the rest + a path 30-31-32 (open wedge, no triangle)
    val clique = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val star = (11L to 15L).map(l => (10L, l))
    val tri = Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val path = Seq((30L, 31L), (31L, 32L))
    val ue = (clique ++ star ++ tri ++ path).toDF("u", "v")
    val got = GraphOps.triangles(ue)
      .as[(Long, Long, Long)].collect().toSet
    val want = Set((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L), (1L, 2L, 3L),
      (20L, 21L, 22L))
    assert(got == want)
  }

  test("triangles: hub node is never a wedge center (degree orientation)") {
    // all edges at a max-degree hub point INTO it, so its oriented
    // out-degree is 0 and it contributes no wedges — the skew guarantee
    // the O(m^1.5) bound rests on. Under id-ordering, hub 0 would emit
    // all 40 edges outward and the wedge stage would enumerate
    // C(40, 2) = 780 pairs at the one skewed node.
    val star = (1L to 40L).map(l => (0L, l)).toDF("u", "v")
    val outDeg = GraphOps.orientByDegree(star)
      .groupBy("src").count().as[(Long, Long)].collect().toMap
    assert(!outDeg.contains(0L), s"hub emitted ${outDeg.getOrElse(0L, 0L)} oriented edges")
    assert(outDeg.values.sum == 40 && outDeg.values.forall(_ == 1))
    assert(GraphOps.triangles(star).count() == 0)
  }
}
