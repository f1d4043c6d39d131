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

  test("PII redaction is idempotent and leaves no detectable PII behind") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val probes = Seq(
      "mail alice.smith@corp.example.org and bob@x.io now",
      "ssn 123-45-6789 phone 415-555-0199 host 192.168.0.1",
      "no pii here at all",
      "edge a@b.co 1.2.3.4 999-99-9999").toDF("t")
    val once = probes.select(col("t"), operators.CleanOps.piiRedact(col("t")).as("r1"))
    val twice = once.select(col("t"), col("r1"),
      operators.CleanOps.piiRedact(col("r1")).as("r2"))
    twice.collect().foreach { row =>
      assert(row.getString(1) == row.getString(2),
        s"redaction not idempotent on '${row.getString(0)}'")
    }
    // post-redaction, every category's count must be zero
    val counts = operators.CleanOps.piiCounts(col("r1"))
    once.select(counts.map { case (cat, c) => c.as(cat) }: _*).collect().foreach { row =>
      (0 until row.length).foreach(i => assert(row.getLong(i) == 0L,
        s"category ${row.schema(i).name} still detected after redaction"))
    }
    // and the clean probe passes through byte-identical
    val clean = once.filter(col("t") === "no pii here at all").head()
    assert(clean.getString(0) == clean.getString(1))
  }

  test("boilerplate stripping is frequency-correct and the frequent set broadcasts") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    // 60 docs: a shared footer in all, a half-corpus banner, unique bodies
    val docs = (0L until 60L).map { i =>
      val banner = if (i % 2 == 0) "\nspecial offer today" else ""
      (i, s"body line $i$banner\nshared footer")
    }.toDF("doc_id", "t")
    val out = operators.CleanOps.stripBoilerplateLines(docs, "t", maxDf = 40)
    val rows = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // footer (df=60) stripped everywhere; banner (df=30 <= 40) kept
    (0L until 60L).foreach { i =>
      val (nLines, nKept) = rows(i)
      val expLines = if (i % 2 == 0) 3L else 2L
      assert(nLines == expLines, s"doc $i: n_lines=$nLines")
      assert(nKept == expLines - 1, s"doc $i: footer not stripped (kept=$nKept)")
    }
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"frequent-line probe lost its broadcast:\n$p")
  }
}
