package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables

/** Training-corpus preparation operators (north-star tier; no reference
  * counterpart): benchmark decontamination, repetition-based quality
  * filtering, and context-window sequence packing.
  *
  * All three are the shapes a pretraining-data pipeline runs right before
  * mixing: drop documents that leak the eval set, drop degenerate
  * repetitive documents, then pack the survivors into fixed token windows.
  */
object TrainPrepOps {

  /** token n-gram width for decontamination — long enough that unrelated
    * documents of this corpus share none (probed: at 5 tokens only true
    * near-duplicates overlap; at 3 tokens >50% of the corpus matches) */
  val DecontamN = 5

  /** context-window token budget for sequence packing */
  val SeqBudget = 256L

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  /** space-joined n-token-gram strings per row, empty when the doc is
    * shorter than n (sequence(1, negative) would count DOWN in Spark —
    * guard required). Shared with the streaming decontamination gate. */
  private[graft] def gramsExpr(n: Int): String =
    s"""CASE WHEN size(toks) >= $n THEN
       |  transform(sequence(1, size(toks) - ${n - 1}),
       |    i -> array_join(slice(toks, i, $n), ' '))
       |ELSE CAST(array() AS array<string>) END""".stripMargin

  /** the held-out eval split (the deterministic 2% "benchmark") — the ONE
    * definition the batch gate and the streaming gate both key on */
  private[graft] def isEvalDoc: Column = col("doc_id") % 50 === 7

  /** (doc_id, gh): md5 digests of each document's 5-token grams — the
    * decontamination join key pipeline, shared batch/streaming */
  private[graft] def gramsOf(df: DataFrame): DataFrame = df
    .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
    .select(col("doc_id"), explode(expr(gramsExpr(DecontamN))).as("gram"))
    .select(col("doc_id"), md5(col("gram").cast("binary")).as("gh"))

  val queries: Seq[GraftQuery] = Seq(

    // benchmark decontamination: flag training documents that share any
    // 5-token n-gram with the held-out eval split (doc_id % 50 = 7 — the
    // deterministic 2% "benchmark"). The eval gram set is tiny by
    // construction (benchmarks are small), so it broadcasts; the corpus
    // side is one linear scan + per-doc count — no all-pairs stage, no
    // shuffle of the corpus beyond the final per-doc aggregation. Grams
    // travel as md5 digests, not strings: a fixed-width join key at 100 TB.
    GraftQuery("decontam_ngram",
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
         |  FROM documents),
         |g AS (SELECT DISTINCT doc_id, md5(gram) AS gh FROM (
         |    SELECT doc_id, unnest(list_transform(
         |        generate_series(1, len(toks) - ${DecontamN - 1}),
         |        i -> list_aggregate(toks[i:i+${DecontamN - 1}], 'string_agg', ' '))) AS gram
         |    FROM t)),
         |eg AS (SELECT DISTINCT gh FROM g WHERE doc_id % 50 = 7),
         |ov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |       FROM g JOIN eg USING (gh) WHERE doc_id % 50 <> 7 GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(ov.n_shared, 0) AS n_shared,
         |       COALESCE(ov.n_shared, 0) >= 1 AS contaminated
         |FROM t LEFT JOIN ov ON ov.doc_id = t.doc_id
         |WHERE t.doc_id % 50 <> 7 ORDER BY t.doc_id""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val d = docs(spark, sfDir)
      // grams are generated AFTER the split filters: the eval pipeline only
      // tokenizes the 2% benchmark slice, and the corpus side never
      // shuffles its grams — duplicates collapse in the per-doc
      // countDistinct AFTER the broadcast join, so only matching grams
      // (rare by construction) reach the aggregation exchange
      val evalGrams = gramsOf(d.filter(isEvalDoc)).select("gh").distinct()
      val overlap = gramsOf(d.filter(!isEvalDoc))
        .join(broadcast(evalGrams), Seq("gh"))
        .groupBy("doc_id").agg(countDistinct("gh").as("n_shared"))
      d.filter(!isEvalDoc).select("doc_id")
        .join(overlap, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) >= 1).as("contaminated"))
        .orderBy("doc_id")
    },

    // repetition filter (the Gopher-style degenerate-text gate): duplicate-
    // bigram fraction and most-frequent-bigram fraction per document, with
    // the keep verdict at the probed 0.1/0.1 thresholds (corpus q99 ≈ 0.10
    // for both — the gate drops the true ~1% repetitive tail). One
    // explode + two hash aggregations; the keep comparison uses the
    // unrounded IEEE quotient on both engines so the boolean cannot drift.
    GraftQuery("text_repetition",
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |        i -> concat(toks[i], ' ', toks[i + 1]))) AS bg FROM t),
        |c AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY doc_id, bg),
        |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |        CAST(count(*) AS BIGINT) AS n_distinct_bg, CAST(max(n) AS BIGINT) AS top_n
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_distinct_bg, top_n,
        |  round(CAST(n_bigrams - n_distinct_bg AS DOUBLE) / n_bigrams, 6) AS dup_frac,
        |  round(CAST(top_n AS DOUBLE) / n_bigrams, 6) AS top_frac,
        |  (CAST(n_bigrams - n_distinct_bg AS DOUBLE) / n_bigrams <= 0.1
        |   AND CAST(top_n AS DOUBLE) / n_bigrams <= 0.1) AS keep
        |FROM a ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
      val t = docs(spark, sfDir)
        .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
      val b = t.select(col("doc_id"), explode(expr(gramsExpr(2))).as("bg"))
      val a = b.groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(sum("n").as("n_bigrams"), count(lit(1)).as("n_distinct_bg"),
          max("n").as("top_n"))
      val dupQ = (col("n_bigrams") - col("n_distinct_bg")).cast("double") / col("n_bigrams")
      val topQ = col("top_n").cast("double") / col("n_bigrams")
      a.select(col("doc_id"), col("n_bigrams"), col("n_distinct_bg"), col("top_n"),
        round(dupQ, 6).as("dup_frac"), round(topQ, 6).as("top_frac"),
        (dupQ <= 0.1 && topQ <= 0.1).as("keep"))
        .orderBy("doc_id")
    },

    // context-window sequence packing (GPT-style concat-and-chop): the
    // corpus is concatenated in doc_id order and chopped into fixed
    // 256-token windows; seq = cum // 256 + 1, the floor-based next-fit
    // relaxation (a document whose final token lands exactly on a window
    // boundary starts the NEXT window — the same relaxation pack_nextfit
    // applies to Data-Box bins). It reuses the
    // distributed two-phase prefix sum (PackingOps.nextFitDist) — range
    // partition, local cumsum, broadcast per-partition offsets; no global
    // single-partition window anywhere.
    GraftQuery("train_pack_sequences",
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w AS (SELECT doc_id, n_tokens,
         |    CAST(sum(CASE WHEN n_tokens > $SeqBudget THEN 0 ELSE n_tokens END)
         |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |       CASE WHEN n_tokens > $SeqBudget THEN CAST(0 AS BIGINT)
         |            ELSE cum // $SeqBudget + 1 END AS seq
         |FROM w ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
      val sizes = docs(spark, sfDir)
        .select(
          // zero-padded key: string range-partitioning must agree with
          // numeric doc_id order; %019d covers any non-negative long
          // (lpad would TRUNCATE ids beyond the pad width)
          format_string("%019d", col("doc_id")).as("path"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("size"))
      PackingOps.nextFitDist(spark, sizes, capacity = SeqBudget)
        .select(col("path").cast("long").as("doc_id"),
          col("size").as("n_tokens"), col("unit").as("seq"))
        .orderBy("doc_id")
    }
  )
}
