package graft

import org.scalatest.funsuite.AnyFunSuite

/** LSH ANN quality: recall@10 of sim_ann_lsh against the brute-force
  * oracle-checked baseline. Multi-table 4×4-bit hyperplane LSH probing a
  * single bucket per table — recall is not 1.0 by design; assert a floor. */
class SimilaritySpec extends AnyFunSuite {

  test("ann lsh recall@10 >= 0.8 vs brute force on sf0.001") {
    val spark = TestSpark.spark
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.nonEmpty)
    val recall = (brute & ann).size.toDouble / brute.size
    info(f"ann recall@10 = $recall%.3f (|brute|=${brute.size}, |ann|=${ann.size})")
    assert(recall >= 0.8, f"recall $recall%.3f below floor (8 tables × 4 bits, hamming-1 multiprobe)")
  }

  test("top-1 neighbor similarity is sane (cosine in [-1, 1], high for near-dups)") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("sim_cosine_topk")(spark, TestSpark.Sf).collect()
    rows.foreach { r =>
      val sim = r.getDouble(3)
      assert(sim >= -1.000001 && sim <= 1.000001)
    }
  }
}
