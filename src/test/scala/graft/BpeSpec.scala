package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent (plain-Scala) recompute of the distributed BPE trainer —
  * pins the greedy-merge and tie-break semantics against a third
  * implementation, beyond the DuckDB fold oracle. */
class BpeSpec extends AnyFunSuite with CacheDrained {

  /** reference greedy non-overlapping left-to-right merge */
  private def merge(toks: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** reference trainer: word counts → R rounds of (top pair, merge) */
  private def referenceTrain(corpus: Seq[String], rounds: Int)
      : (Seq[(String, String, Long)], Map[Vector[String], Long]) = {
    val words = corpus
      .flatMap(t => "[a-z]+".r.findAllIn(t))
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector :+ "_") -> ws.size.toLong
      }
    var state = words
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (toks, cnt) =>
        toks.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _         =>
        }
      }
      val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
      merges += ((l, r, c))
      state = state.map { case (toks, cnt) => merge(toks, l, r) -> cnt }
    }
    (merges.result(), state)
  }

  test("text_bpe_merges equals a plain-Scala reference BPE trainer") {
    val spark = TestSpark.spark
    val corpus = Tables.documents(spark, TestSpark.Sf)
      .select("text").collect().map(_.getString(0)).toSeq
    val (expected, _) = referenceTrain(corpus, graft.operators.BpeOps.Rounds)
    val got = SparkEntry.queries("text_bpe_merges")(spark, TestSpark.Sf)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the learned merges are real subwords, not all single chars
    assert(expected.exists { case (l, r, _) => (l + r).length > 2 })
  }

  test("forced distributed loop equals the driver fast path (merges + vocab)") {
    val spark = TestSpark.spark
    import graft.operators.BpeOps
    // fast path (default: sf word count is far below the cap)
    val fastMerges = SparkEntry.queries("text_bpe_merges")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(BpeOps.driverBpeWordsSeen.get() > 0L, "fast path did not engage")
    val fastVocab = SparkEntry.queries("text_bpe_vocab")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    CacheTracker.releaseAll(blocking = true)
    // forced distributed loop
    spark.conf.set(BpeOps.WordCapKey, "0")
    val (loopMerges, loopVocab) =
      try {
        val m = SparkEntry.queries("text_bpe_merges")(spark, TestSpark.Sf)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          .sortBy(_._1).toSeq
        assert(BpeOps.driverBpeWordsSeen.get() == 0L, "loop run took the fast path")
        val v = SparkEntry.queries("text_bpe_vocab")(spark, TestSpark.Sf)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        (m, v)
      } finally spark.conf.unset(BpeOps.WordCapKey)
    assert(loopMerges == fastMerges)
    assert(loopVocab == fastVocab)
  }

  test("greedy fold handles the l==r run-overlap case like the reference") {
    // "aaa" must merge to [aa, a], not [aa, aa] — the fold's merged token
    // can never re-match l, which is exactly the greedy scan's skip
    assert(merge(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(merge(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
  }

  test("text_bpe_encode token counts stay within the prefix bound and compress") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("text_bpe_encode")(spark, TestSpark.Sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val prefix = docs(r.getLong(0)).take(120)
      val n = r.getLong(1)
      // merging only ever joins adjacent tokens: count in (0, |prefix|]
      assert(n <= prefix.length && (prefix.isEmpty || n > 0))
    }
    // merges fire somewhere: at least one doc compresses below char count
    assert(rows.exists(r => r.getLong(1) < docs(r.getLong(0)).take(120).length))
  }

  test("text_bpe_encode single-pass encoder equals the legacy fold expression") {
    // r13 rewrote the encode tail from 50 chained aggregate() HOF folds
    // (CodegenFallback, O(len²) accumulator concats) to one JVM scan chain
    // per doc (BpeOps.encodeTokens). This differential keeps the legacy
    // expression path alive as the semantic pin: identical (doc_id,
    // n_tokens, toks_md5) on the full sf corpus, plus the two edge cases
    // the expression form defined implicitly (null text → null row; empty
    // prefix → the fold's [""] on Spark's descending sequence(1, 0)).
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    import graft.operators.BpeOps
    val merges = SparkEntry.queries("text_bpe_merges")(spark, TestSpark.Sf)
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    val chars = expr(
      "transform(sequence(1, length(substr(text, 1, 120))), i -> substr(substr(text, 1, 120), i, 1))")
    val folded = merges.foldLeft(chars: Column)((c, m) => BpeOps.mergeCol(c, m._1, m._2))
    val legacy = Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"), size(folded).cast("long").as("n_tokens"),
        md5(concat_ws("", folded)).as("toks_md5"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val got = SparkEntry.queries("text_bpe_encode")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got == legacy)
    assert(BpeOps.encodeTokens(null, Array(("a", "b"))) == null)
    assert(BpeOps.encodeTokens("", Array(("a", "b"))).toSeq == Seq(""))
    // code-point prefix semantics match Spark substr (chars, not UTF-16 units)
    val astral = "😀" * 130 // 130 code points, 260 UTF-16 units
    assert(BpeOps.encodeTokens(astral, Array.empty).length == 120)
  }

  test("text_bpe_vocab carries the learned subwords with exact frequencies") {
    val spark = TestSpark.spark
    val corpus = Tables.documents(spark, TestSpark.Sf)
      .select("text").collect().map(_.getString(0)).toSeq
    val (_, finalState) = referenceTrain(corpus, graft.operators.BpeOps.Rounds)
    val expected = finalState.toSeq
      .flatMap { case (toks, cnt) => toks.map(_ -> cnt) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy { case (t, f) => (-f, t) }.take(30)
    val got = SparkEntry.queries("text_bpe_vocab")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.exists(_._1.length > 1), "vocab contains a learned multi-char subword")
  }
}
