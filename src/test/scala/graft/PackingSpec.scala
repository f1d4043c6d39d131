package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PackingOps

/** Property tests for the bin-packing allocator (SURVEY.md §5):
  * invariants of exact first-fit and its next-fit window relaxation.
  * Deterministic seeded generation (no scalatestplus bridge offline). */
class PackingSpec extends AnyFunSuite {

  private val capacity = 1000L

  private def cases: Seq[List[Long]] = {
    val rnd = new Random(42)
    Seq.fill(200)(List.fill(60)(1L + rnd.nextInt(1500).toLong))
  }

  test("first-fit: no bin exceeds capacity; oversized stay unit 0") {
    cases.foreach { sizes =>
      val named = sizes.zipWithIndex.map { case (s, i) => (f"p$i%04d", s) }
      val packed = PackingOps.firstFit(named, capacity)
      packed.filter(_._3 != 0L).groupBy(_._3).foreach { case (_, items) =>
        assert(items.map(_._2).sum <= capacity)
      }
      packed.foreach { case (_, s, u) =>
        if (s > capacity) assert(u == 0L) else assert(u > 0L)
      }
    }
  }

  test("first-fit backfills earlier bins (is not next-fit)") {
    val a = PackingOps.firstFit(Seq(("a", 600L), ("b", 500L), ("c", 400L)), 1000L)
    assert(a.map(_._3) == Seq(1L, 2L, 1L))
  }

  test("next-fit cumsum relaxation opens at most ~2x first-fit bins") {
    cases.foreach { sizes =>
      val named = sizes.zipWithIndex.map { case (s, i) => (f"p$i%04d", s) }
      val ff = PackingOps.firstFit(named, capacity)
      val ffBins = ff.map(_._3).filter(_ != 0L).distinct.size
      var cum = 0L
      val nfUnits = named.map { case (_, s) =>
        if (s > capacity) 0L else { cum += s; cum / capacity + 1 }
      }
      val nfBins = nfUnits.filter(_ != 0L).distinct.size
      if (ffBins > 0) assert(nfBins <= 2 * ffBins + 1)
    }
  }

  test("spark first-fit query matches the pure fold on sf0.001") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("pack_firstfit")(spark, TestSpark.Sf)
      .orderBy("path").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sizes = PackingOps.dirSizes(spark, TestSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("path").endsWith("0"))
      .orderBy("path")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.toSeq == PackingOps.firstFit(sizes, PackingOps.Capacity))
  }
}
