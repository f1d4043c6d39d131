package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the ScaleData amplification transforms — the sf1/sf10
  * scaling evidence in SCALING.md is only meaningful if the per-replica
  * edits (a) preserve within-replica similarity structure and (b) never
  * manufacture cross-replica clones. */
class ScaleDataSpec extends AnyFunSuite {

  private def base = {
    val spark = TestSpark.spark
    Tables.embeddings(spark, TestSpark.Sf).limit(8)
  }

  private def vecs(r: Long): Map[Long, Array[Double]] = {
    val vecK = 1000000L
    ScaleData.embEdit(vecK)(base, r)
      .selectExpr(s"vec_id - ${r * vecK} AS base_id",
        "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .collect().map(row => row.getLong(0) -> row.getSeq[Double](1).toArray).toMap
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }; s
    }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("embedding replicas preserve within-replica pairwise cosines") {
    val v0 = vecs(0)
    val ids = v0.keys.toSeq.sorted
    // rotation (and reversal for r >= 64) are orthogonal maps: every
    // within-replica pair's cosine must match replica 0's up to float
    // summation order
    for (r <- Seq(1L, 9L, 37L, 64L, 71L, 127L)) {
      val vr = vecs(r)
      for { i <- ids; j <- ids if i < j } {
        val c0 = cos(v0(i), v0(j))
        val cr = cos(vr(i), vr(j))
        assert(math.abs(c0 - cr) < 1e-9,
          s"replica $r pair ($i,$j): cosine $cr != base $c0")
      }
    }
  }

  test("no two replicas of the same base vector are component-identical") {
    // the r>=64 reversal exists precisely because rotations repeat mod 64;
    // sample replica pairs including the (r, r+64) collision the reversal
    // prevents and the (0, r) pure-rotation cases
    val reps = Seq(0L, 1L, 7L, 63L, 64L, 65L, 71L, 127L).map(r => r -> vecs(r)).toMap
    val ids = reps(0L).keys.toSeq.sorted
    for {
      (r1, v1) <- reps; (r2, v2) <- reps if r1 < r2
      id <- ids
    } {
      assert(!v1(id).sameElements(v2(id)),
        s"vec $id identical in replicas $r1 and $r2")
    }
  }

  test("document replicas mutate every 7-char window but keep replica 0 verbatim") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.Sf).limit(4)
    val docK = 1000000L
    val t0 = ScaleData.docEdit(docK)(docs, 0L)
      .selectExpr("doc_id AS base_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = docs.selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t0 == orig, "replica 0 must be the untouched base corpus")
    for (r <- Seq(3L, 42L)) {
      val tr = ScaleData.docEdit(docK)(docs, r)
        .selectExpr(s"doc_id - ${r * docK} AS base_id", "text").collect()
        .map(row => row.getLong(0) -> row.getString(1)).toMap
      orig.foreach { case (id, t) =>
        val expected = t.grouped(7).map { g =>
          if (g.length == 7) g + r else g
        }.mkString
        assert(tr(id) == expected, s"replica $r doc $id interleave mismatch")
      }
    }
  }
}
