package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.,
  * ACL'16) — the vocabulary-induction step of an LLM data pipeline, as a
  * Spark-first iteration (north-star op; no counterpart in the reference).
  *
  * Shape for 100 TB: ONE corpus-sized pass (word extraction → word-count
  * hash aggregation, combiner-friendly, shuffles only distinct words);
  * every merge round after that operates on the BOUNDED vocabulary table
  * (≤ a few million rows regardless of corpus size — this is how
  * industrial BPE trainers scale, they train on word counts, not tokens).
  * Per round: one vocab-sized pair-count aggregation, a top-1 ordered agg
  * (1-row collect, bounded), and a per-word greedy re-merge projection.
  * Lineage is truncated through eager localCheckpoints every
  * [[CheckpointEvery]] rounds (the [[GraphOps]] hygiene: ≤2 live
  * checkpoint RDDs, plan depth bounded by the stride — ~1.2 jobs/round
  * instead of 2, which is what holds 50 rounds to ~0.11 s/round).
  *
  * The greedy left-to-right merge is a fold: scanning tokens once,
  * merging when the accumulator's LAST token is `l` and the incoming
  * token is `r`. Because a merged token `l+r` can never re-equal `l`
  * (strictly longer), the fold is exactly the greedy non-overlapping
  * scan — including the `l==r` run case ("aaa" → [aa, a]). The oracle
  * replays the identical fold via DuckDB `list_reduce` over a
  * US(0x1f)-delimited accumulator, so token boundaries stay explicit and
  * the learned merge table is bit-comparable.
  */
object BpeOps {

  /** merge rounds learned (and unrolled in the oracle CTE chain) — a
    * production-ish count, 5× the demo 10 of rounds ≤5, proving round
    * scaling stays linear in rounds (SCALING.md §BPE steady state) */
  private[graft] val Rounds = 50

  /** Lineage-truncation stride: one eager localCheckpoint job every
    * CheckpointEvery rounds instead of one per round. Rounds in between
    * stack ≤ CheckpointEvery merge projections on the checkpointed plan —
    * vocab-sized recompute, bounded expression depth — so the fixed
    * per-round job overhead drops from 2 jobs/round (top-1 collect +
    * checkpoint) to 1 + 1/CheckpointEvery. */
  private val CheckpointEvery = 5

  /** doc-prefix length encoded by text_bpe_encode (bounds the per-doc fold) */
  private val EncodeChars = 120

  /** FAST-PATH gate: distinct-word count below which the merge loop runs
    * on the driver over the collected word table (the [[graft.operators.GraphOps]]
    * CC fast-path pattern). The word table is BOUNDED — it is the corpus
    * vocabulary, not the corpus — so at the cap the driver holds ~1M
    * (word, cnt, toks) rows ≈ 0.5 GB; above it the distributed loop runs
    * unchanged. Rationale (measured, r12): at sf0.1 the loop grinds a
    * 31-row table through ~60 Spark jobs whose cost is pure driver-side
    * AQE/planning latency — thread dumps across an entire run show every
    * executor idle. A 100 TB corpus changes the one corpus-sized pass
    * (word extraction), not this loop's input size. */
  private val DriverWordCap = 1000000L

  /** conf key overriding [[DriverWordCap]] (0 forces the distributed
    * loop — the differential-spec hook, same contract as the CC cap) */
  private[graft] val WordCapKey = "spark.graft.bpe.driverWordCap"

  /** words resident in the last driver fast-path run (spec observable;
    * 0 after a distributed-loop run). Test hook only; local mode. */
  private[graft] val driverBpeWordsSeen =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** token separator inside the fold accumulator: US, not in [a-z_] */
  private val Sep = ""

  // ---------------------------------------------------------------- Spark

  /** distinct corpus words with counts and initial char+end-marker tokens */
  private def wordTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("toks",
        expr("array_append(transform(sequence(1, length(word)), i -> substr(word, i, 1)), '_')"))

  /** greedy non-overlapping merge of adjacent (l, r) into l+r, as a fold
    * (private[graft] for the encode-path differential spec) */
  private[graft] def mergeCol(toks: Column, l: String, r: String): Column =
    split(
      aggregate(toks, lit(""), (acc, t) =>
        when((acc === lit(l) || acc.endsWith(Sep + l)) && t === lit(r),
          concat(acc, lit(r)))
          .otherwise(when(acc === lit(""), t)
            .otherwise(concat(acc, lit(Sep), t)))),
      Sep)

  /** adjacent-pair counts (overlapping occurrences, standard BPE).
    * The size >= 2 guard matters once merges land: a fully-merged word is
    * a single token, and Spark's sequence(1, 0) is the DESCENDING [1, 0]
    * (not empty like DuckDB's generate_series) — without the guard the
    * pair lambda indexes past the array and kills the round at the first
    * corpus whose small words merge to completion (seen at sf1). */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(expr(
        """filter(transform(sequence(1, size(toks)),
          |  i -> named_struct('l', element_at(toks, i), 'r', try_element_at(toks, i + 1))),
          |  p -> p.r IS NOT NULL)"""
          .stripMargin)).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").cast("long").as("c"))

  private case class Merge(round: Long, l: String, r: String, c: Long)

  /** greedy non-overlapping left-to-right merge (the scan form; provably
    * identical to the distributed fold in [[mergeCol]] — a merged token is
    * strictly longer than `l` so it can never re-match, which makes the
    * fold exactly this scan; BpeSpec pins both against each other) */
  private def mergeScan(toks: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Single-pass encoder: the EncodeChars code-point prefix split to
    * per-character tokens, then every learned merge applied in training
    * order via [[mergeScan]] — one JVM scan chain per doc instead of the
    * former 50 chained `aggregate()` higher-order-function folds, which
    * are CodegenFallback (interpreted per row; the r13 before-plan is ONE
    * 39 KB Project expression with zero compiled evaluation) and rebuild
    * the US-joined accumulator string by O(len²) concats per round.
    * Semantics are the fold's, exactly: mergeScan ≡ the fold for the
    * nonempty single-char tokens this path produces (BpeSpec pins both,
    * plus an encode differential against the legacy expression), the
    * prefix is taken in CODE POINTS like Spark's substr, a null text
    * stays null, and an empty prefix returns [""] — the fold's output on
    * Spark's descending sequence(1, 0) index quirk. */
  private[graft] def encodeTokens(
      text: String, ms: Array[(String, String)]): Array[String] =
    if (text == null) null
    else {
      val cps = text.codePoints().limit(EncodeChars.toLong).toArray
      if (cps.isEmpty) Array("")
      else {
        var toks = cps.map(cp => new String(Character.toChars(cp)))
        var i = 0
        while (i < ms.length) {
          toks = mergeScan(toks, ms(i)._1, ms(i)._2)
          i += 1
        }
        toks
      }
    }

  /** driver-side merge loop over the collected word table: identical
    * pair-count / top-1 tie-break / greedy-merge semantics to the
    * distributed loop, zero Spark jobs per round */
  private def trainOnDriver(
      spark: SparkSession,
      words: Array[(String, Long, Array[String])]): (Seq[Merge], DataFrame) = {
    val toks = words.map(_._3)
    val merges = Seq.newBuilder[Merge]
    for (round <- 1 to Rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var w = 0
      while (w < toks.length) {
        val t = toks(w); val c = words(w)._2
        var i = 0
        while (i + 1 < t.length) {
          val k = (t(i), t(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
        w += 1
      }
      // deterministic top pair: count desc, then (l, r) ascending — ASCII
      // order, which for the [a-z_] token alphabet equals Spark's
      // UTF8String binary asc ordering
      var bl: String = null; var br: String = null; var bc = -1L
      counts.foreach { case ((l, r), c) =>
        if (c > bc || (c == bc &&
            (l < bl || (l == bl && r < br)))) { bl = l; br = r; bc = c }
      }
      // fail-loud contract match: the distributed loop's collect()(0) on an
      // empty top-1 throws when every word is fully merged before Rounds
      // complete — the fast path must not silently emit null merges instead
      require(bc >= 0, s"BPE round $round: no pair left to merge " +
        s"(corpus vocabulary exhausted before $Rounds rounds)")
      merges += Merge(round.toLong, bl, br, bc)
      w = 0
      while (w < toks.length) {
        val t = toks(w)
        var hit = false; var i = 0
        while (!hit && i + 1 < t.length) {
          if (t(i) == bl && t(i + 1) == br) hit = true
          i += 1
        }
        if (hit) toks(w) = mergeScan(t, bl, br)
        w += 1
      }
    }
    import spark.implicits._
    val finalWords = words.indices
      .map(w => (words(w)._1, words(w)._2, toks(w).toSeq))
      .toDF("word", "cnt", "toks")
    (merges.result(), finalWords)
  }

  /** run the training loop; returns (learned merges, final word table) */
  private def train(spark: SparkSession, sfDir: String): (Seq[Merge], DataFrame) = {
    var checkpointed = wordTable(spark, sfDir).localCheckpoint(true)
    var words = checkpointed
    // FAST PATH, count-gated: below the cap the merge rounds run on the
    // driver over the (bounded, vocabulary-sized) word table. Measured
    // motivation and budget at [[DriverWordCap]]; the distributed loop is
    // kept live by the forced-loop differential in BpeSpec.
    val cap = spark.conf.getOption(WordCapKey).map(_.toLong).getOrElse(DriverWordCap)
    val nWords = checkpointed.count()
    driverBpeWordsSeen.set(0L)
    if (nWords <= cap) {
      val collected = checkpointed.collect().map { r =>
        (r.getString(0), r.getLong(1), r.getSeq[String](2).toArray)
      }
      checkpointed.unpersist(blocking = false)
      driverBpeWordsSeen.set(collected.length.toLong)
      return trainOnDriver(spark, collected)
    }
    val merges = Seq.newBuilder[Merge]
    for (round <- 1 to Rounds) {
      // deterministic top pair: count desc, then lexicographic (ASCII)
      val top = pairCounts(words)
        .orderBy(desc("c"), asc("l"), asc("r")).limit(1)
        .collect()(0) // bounded: exactly one row
      val (l, r, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += Merge(round.toLong, l, r, c)
      words = words.withColumn("toks", mergeCol(col("toks"), l, r))
      // truncate lineage on the stride (and at the end): in-between rounds
      // replan ≤ CheckpointEvery stacked merge projections over the last
      // checkpoint — vocab-sized, no corpus rescan, bounded plan depth
      if (round % CheckpointEvery == 0 || round == Rounds) {
        val next = words.localCheckpoint(true)
        checkpointed.unpersist(blocking = false)
        checkpointed = next
        words = next
      }
    }
    (merges.result(), words)
  }

  // --------------------------------------------------------------- oracle

  private def mergeSql(toks: String, l: String, r: String): String =
    s"""string_split(list_reduce($toks,
       |  (acc, t) -> CASE WHEN (acc = $l OR ends_with(acc, chr(31) || $l)) AND t = $r
       |                   THEN acc || $r
       |                   ELSE acc || chr(31) || t END), chr(31))""".stripMargin

  /** the unrolled w0 → (p1, w1) → … → (pR, wR) training chain */
  private def chainSql: String = {
    val sb = new StringBuilder(
      """WITH w0 AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        |    list_append(list_transform(generate_series(1, length(word)),
        |                               i -> substr(word, i, 1)), '_') AS toks
        |  FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS word
        |        FROM documents)
        |  GROUP BY word
        |)""".stripMargin)
    // w/p are MATERIALIZED: w_{k-1} is referenced twice (pair counts +
    // merge application) and p_k twice (merge + the final union) — at 50
    // unrolled rounds inlining would re-expand the whole prefix chain per
    // reference (the DuckDB CTE-inlining rule the PCA oracle documents)
    for (k <- 1 to Rounds) {
      sb.append(s""",
        |p$k AS MATERIALIZED (
        |  SELECT l, r, c FROM (
        |    SELECT toks[i] AS l, toks[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS c
        |    FROM w${k - 1}, unnest(generate_series(1, len(toks) - 1)) AS g(i)
        |    GROUP BY 1, 2)
        |  ORDER BY c DESC, l, r LIMIT 1
        |),
        |w$k AS MATERIALIZED (
        |  SELECT word, cnt, ${mergeSql("toks", "p.l", "p.r")} AS toks
        |  FROM w${k - 1}, p$k p
        |)""".stripMargin)
    }
    sb.toString
  }

  private def mergesOracle: String = {
    val union = (1 to Rounds)
      .map(k => s"SELECT $k AS round, l AS left_tok, r AS right_tok, c AS pair_count FROM p$k")
      .mkString("\n  UNION ALL ")
    s"""$chainSql
       |SELECT CAST(round AS BIGINT) AS round, left_tok, right_tok, pair_count
       |FROM ($union) ORDER BY round""".stripMargin
  }

  private def vocabOracle: String =
    s"""$chainSql
       |SELECT tok, CAST(sum(cnt) AS BIGINT) AS freq
       |FROM w$Rounds, unnest(toks) AS u(tok)
       |GROUP BY tok ORDER BY freq DESC, tok LIMIT 30""".stripMargin

  private def encodeOracle: String = {
    val sb = new StringBuilder(chainSql)
    sb.append(s""",
      |d0 AS (
      |  SELECT doc_id, list_transform(generate_series(1, length(substr(text, 1, $EncodeChars))),
      |                                i -> substr(substr(text, 1, $EncodeChars), i, 1)) AS toks
      |  FROM documents
      |)""".stripMargin)
    for (k <- 1 to Rounds)
      sb.append(s""",
        |d$k AS (
        |  SELECT doc_id, ${mergeSql("toks", "p.l", "p.r")} AS toks
        |  FROM d${k - 1}, p$k p
        |)""".stripMargin)
    sb.append(s"""
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  md5(list_aggregate(list_transform(toks, t -> CAST(t AS VARCHAR)), 'string_agg', chr(31))) AS toks_md5
      |FROM d$Rounds ORDER BY doc_id""".stripMargin)
    sb.toString
  }

  // -------------------------------------------------------------- queries

  val queries: Seq[GraftQuery] = Seq(

    // the learned merge table — the tokenizer-training deliverable
    GraftQuery("text_bpe_merges", mergesOracle, bench = true) { (spark, sfDir) =>
      val (merges, words) = train(spark, sfDir)
      words.unpersist(blocking = false)
      import spark.implicits._
      // tuples, not the private case class: Janino cannot codegen an
      // encoder against private accessors
      merges.map(m => (m.round, m.l, m.r, m.c))
        .toDF("round", "left_tok", "right_tok", "pair_count")
    },

    // the induced subword vocabulary (corpus-weighted top 30)
    GraftQuery("text_bpe_vocab", vocabOracle) { (spark, sfDir) =>
      val (_, words) = train(spark, sfDir)
      val out = words
        .select(col("cnt"), explode(col("toks")).as("tok"))
        .groupBy("tok").agg(sum("cnt").cast("long").as("freq"))
        .orderBy(desc("freq"), asc("tok")).limit(30)
      out
    },

    // the tokenizer APPLIED: encode each doc prefix with the learned
    // merges in training order (char-level fold per round, corpus-linear)
    GraftQuery("text_bpe_encode", encodeOracle) { (spark, sfDir) =>
      val (merges, words) = train(spark, sfDir)
      words.unpersist(blocking = false)
      val ms = merges.map(m => (m.l, m.r)).toArray
      val encode = udf((text: String) => encodeTokens(text, ms))
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), encode(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          md5(concat_ws(Sep, col("toks"))).as("toks_md5"))
    }
  )
}
