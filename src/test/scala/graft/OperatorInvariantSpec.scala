package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator invariants for the round-3 additions (each is also
  * hash-oracled; these pin the semantic relationships the oracle can't). */
class OperatorInvariantSpec extends AnyFunSuite with CacheDrained {

  test("containment dominates Jaccard on every overlapping pair") {
    val spark = TestSpark.spark
    val jac = SparkEntry.queries("dedup_jaccard")(spark, TestSpark.Sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cont = SparkEntry.queries("dedup_containment")(spark, TestSpark.Sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    // C(A,B) = i/|A| ≥ i/(|A|+|B|-i) = J(A,B); every Jaccard pair must
    // appear with both containments ≥ its Jaccard (containment is rounded
    // to 6dp in the query output, hence the half-ulp-of-6dp tolerance)
    assert(jac.nonEmpty)
    jac.foreach { case (pair, j) =>
      val (cab, cba) = cont.getOrElse(pair, fail(s"pair $pair missing from containment"))
      assert(cab >= j - 5e-7 && cba >= j - 5e-7, s"$pair: containment below Jaccard")
    }
  }

  test("multimodal near-dup buckets contain at least as many assets as exact groups") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("multimodal_dedup")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nExact) = (r.getLong(4), r.getLong(5))
      assert(n >= 2 && nExact >= 1 && nExact <= n,
        s"bucket ${r.toSeq.take(4)}: n=$n n_exact=$nExact")
      assert(r.getLong(6) <= r.getLong(7), "min_doc > max_doc")
    }
  }

  test("rarity score is bounded below by n_tokens (every term contributes >= 1)") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("text_rarity_score")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // tt DIV c >= 1 since c <= tt, so surprisal >= n_tokens
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: surprisal ${r.getLong(2)} < n_tokens ${r.getLong(1)}")
    }
  }

  test("funnel stage times are ordered and monotone-decreasing in reach") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("events_funnel")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    var nView = 0; var nClick = 0; var nPurchase = 0
    rows.foreach { r =>
      nView += 1
      if (!r.isNullAt(2)) {
        nClick += 1
        assert(r.getLong(2) >= r.getLong(1), "click before first view")
        if (!r.isNullAt(3)) {
          nPurchase += 1
          assert(r.getLong(3) >= r.getLong(2), "purchase before first qualifying click")
        }
      } else assert(r.isNullAt(3), "purchase stage reached without click stage")
    }
    assert(nView >= nClick && nClick >= nPurchase)
    assert(nPurchase > 0, "no user completes the funnel in testdata")
  }

  test("train_split_safe: no near-dup pair ever straddles two splits") {
    val spark = TestSpark.spark
    val split = SparkEntry.queries("train_split_safe")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val pairs = SparkEntry.queries("dedup_jaccard")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && split.size == 500)
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"near-dups $a/$b landed in ${split(a)._2} and ${split(b)._2}")
      assert(split(a)._1 == split(b)._1, s"near-dups $a/$b have different reps")
    }
    // the split is still roughly 90/5/5 (rep-keyed bucketing, same rule
    // as text_split_assign)
    val byS = split.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byS("train") > 400 && byS.getOrElse("val", 0) > 0 && byS.getOrElse("test", 0) > 0)
  }
}
