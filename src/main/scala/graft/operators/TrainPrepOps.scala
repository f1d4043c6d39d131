package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables

/** Training-corpus preparation operators (north-star tier; no reference
  * counterpart): benchmark decontamination (exact n-gram and fuzzy
  * shingle-Jaccard), repetition-based quality filtering, passage-level
  * dedup, source mixing weights, deterministic global shuffle, and
  * context-window sequence packing.
  *
  * Together these are the shapes a pretraining-data pipeline runs right
  * before mixing: drop documents that leak the eval set, drop degenerate
  * repetitive documents, remove passages repeated across the corpus, pick
  * per-source sampling weights, fix a reproducible training order, and
  * pack the survivors into fixed token windows.
  */
object TrainPrepOps {

  /** token n-gram width for decontamination — long enough that unrelated
    * documents of this corpus share none (probed: at 5 tokens only true
    * near-duplicates overlap; at 3 tokens >50% of the corpus matches) */
  val DecontamN = 5

  /** context-window token budget for sequence packing */
  val SeqBudget = 256L

  /** fixed passage width (tokens) for passage-level dedup — the
    * chunk-level relaxation of repeated-substring removal (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", 2022):
    * exact suffix-array matching is replaced by fixed windows so the whole
    * operator is two hash aggregations, which is what actually runs at
    * corpus scale */
  val PassageLen = 20

  /** shingle-Jaccard bar for FUZZY decontamination — far above unrelated-
    * document overlap (probed at sf0.01: eval-vs-corpus Jaccard is 0.96+
    * for true near-dups, ≤ 0.11 for everything else) */
  val FuzzyDecontamThreshold = 0.5

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

    // repetition filter (the Gopher-style degenerate-text gate,
    // Rae et al. 2021 §A1.1): duplicate-bigram fraction and
    // most-frequent-bigram fraction per document, with the keep verdict
    // at the probed 0.1/0.1 thresholds (corpus q99 ≈ 0.10 for both — the
    // gate drops the true ~1% repetitive tail). One explode + two hash
    // aggregations; the keep comparison uses the unrounded IEEE quotient
    // on both engines so the boolean cannot drift.
    //
    // Plan choice, MEASURED (r10): the "obvious" zero-shuffle rewrite —
    // array_sort the per-row bigram array and read total/distinct/top off
    // it with an aggregate() fold — is 3.7× SLOWER at sf0.1 (2.7 s vs
    // 0.73 s warm): lambda HOFs evaluate interpreted (no whole-stage
    // codegen, boxed per element), while the explode + partial hash-agg
    // path is fully codegen'd and collapses duplicate bigrams MAP-SIDE,
    // so the exchange carries (doc, distinct-bigram) pairs, not the raw
    // stream. Shuffle-count is not the objective function — wall clock
    // is; the exchange here is the cheap part.
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
    },

    // Packing efficiency accounting — the fill-rate audit run beside the
    // packer: per emitted sequence, document count, token total and the
    // integer-ppm fill of the context budget (plus the oversize row count
    // the packer routed to seq 0). The per-(run) waste = 1e6 − fill_ppm
    // summed over sequences is what decides whether the budget or the
    // chopping policy moves. Same prefix-sum machinery as
    // train_pack_sequences, one extra hash aggregation; fill_ppm ≤ 1e6 ·
    // budget so the multiply is int64-safe at any corpus size.
    GraftQuery("train_pack_stats",
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w AS (SELECT doc_id, n_tokens,
         |    CAST(sum(CASE WHEN n_tokens > $SeqBudget THEN 0 ELSE n_tokens END)
         |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM t),
         |pk AS (SELECT doc_id, n_tokens,
         |    CASE WHEN n_tokens > $SeqBudget THEN CAST(0 AS BIGINT)
         |         ELSE cum // $SeqBudget + 1 END AS seq
         |  FROM w)
         |SELECT seq, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
         |       CAST(CASE WHEN seq = 0 THEN 0
         |            ELSE sum(n_tokens) * 1000000 // $SeqBudget END AS BIGINT) AS fill_ppm
         |FROM pk GROUP BY seq ORDER BY seq""".stripMargin) { (spark, sfDir) =>
      val sizes = docs(spark, sfDir)
        .select(format_string("%019d", col("doc_id")).as("path"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("size"))
      PackingOps.nextFitDist(spark, sizes, capacity = SeqBudget)
        .groupBy(col("unit").as("seq"))
        .agg(count(lit(1)).as("n_docs"), sum("size").as("seq_tokens"))
        .select(col("seq"), col("n_docs"), col("seq_tokens"),
          expr(s"CASE WHEN seq = 0 THEN CAST(0 AS BIGINT) ELSE seq_tokens * 1000000 DIV $SeqBudget END")
            .as("fill_ppm"))
        .orderBy("seq")
    },

    // passage-level dedup (first-occurrence-wins): the corpus is chopped
    // into fixed 20-token passages; a passage instance survives iff it is
    // the globally FIRST occurrence of its content (order = (doc_id, pos)),
    // and each document is reassembled from its surviving passages. This is
    // the chunk-level relaxation of repeated-substring removal — the form
    // that scales: first-occurrence is a partial-aggregated
    // min(struct(doc_id, pos)) per passage md5 plus one fixed-width-key
    // equi-join back, NOT a window over the passage hash (same rows, but
    // the groupBy combines map-side where a window must shuffle + sort
    // every instance), and reassembly is a per-document sort of a
    // doc-length-bounded list. At 100 TB both shuffles carry only
    // (md5, doc_id, pos) triples.
    GraftQuery("dedup_passages",
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
         |  FROM documents),
         |px AS (SELECT doc_id, toks,
         |    unnest(generate_series(1, (len(toks) + ${PassageLen - 1}) // $PassageLen)) AS pos
         |  FROM t),
         |p AS (SELECT doc_id, pos,
         |    list_aggregate(toks[(pos - 1) * $PassageLen + 1 : pos * $PassageLen],
         |      'string_agg', ' ') AS passage
         |  FROM px),
         |k AS (SELECT doc_id, pos, passage,
         |    row_number() OVER (PARTITION BY md5(passage) ORDER BY doc_id, pos) AS rn
         |  FROM p)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_passages,
         |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       md5(coalesce(string_agg(passage, ' ' ORDER BY pos)
         |                      FILTER (WHERE rn = 1), '')) AS clean_md5
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val passagesExpr =
        s"""CASE WHEN size(toks) >= 1 THEN
           |  transform(sequence(1, (size(toks) + ${PassageLen - 1}) div $PassageLen),
           |    i -> array_join(slice(toks, (i - 1) * $PassageLen + 1, $PassageLen), ' '))
           |ELSE CAST(array() AS array<string>) END""".stripMargin
      val p = docs(spark, sfDir)
        .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
        .select(col("doc_id"), posexplode(expr(passagesExpr)).as(Seq("pos0", "passage")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("passage"),
          md5(col("passage").cast("binary")).as("ph"))
      val firsts = p.groupBy("ph").agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      p.join(firsts, Seq("ph"))
        .withColumn("kept", struct(col("doc_id"), col("pos")) === col("f"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_passages"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          md5(array_join(
            transform(
              sort_array(collect_list(when(col("kept"),
                struct(col("pos"), col("passage"))))),
              x => x("passage")),
            " ").cast("binary")).as("clean_md5"))
        .orderBy("doc_id")
    },

    // FUZZY decontamination: corpus documents whose shingle-set Jaccard
    // against ANY eval-split document clears the bar — the companion to
    // decontam_ngram that catches paraphrased/mutated leaks an exact
    // n-gram match misses. Rides the dedup family's cached df-filtered
    // shingle arrays; the eval side (2% split — benchmarks are small by
    // nature) broadcasts, so the corpus never shuffles: candidates form in
    // a map-side hash join and die in the per-(doc, eval) aggregation.
    GraftQuery("decontam_fuzzy",
      s"""WITH ${DedupOps.ShinglesCte},
         |sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
         |          FROM shf a JOIN shf b ON a.h = b.h
         |          WHERE a.doc_id % 50 <> 7 AND b.doc_id % 50 = 7
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT ida AS doc_id, idb AS eval_id,
         |       CAST(inter.i AS DOUBLE) / (sa.n + sb.n - inter.i) AS jacc
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = inter.ida
         |JOIN sizes sb ON sb.doc_id = inter.idb
         |WHERE CAST(inter.i AS DOUBLE) / (sa.n + sb.n - inter.i)
         |        >= $FuzzyDecontamThreshold
         |ORDER BY doc_id, eval_id""".stripMargin) { (spark, sfDir) =>
      val s = DedupOps.docShingles(spark, sfDir)
      val corp = s.filter(!isEvalDoc)
        .select(col("doc_id"), col("n").as("na"), explode(col("sh")).as("h"))
      val eval = s.filter(isEvalDoc)
        .select(col("doc_id").as("eval_id"), col("n").as("nb"),
          explode(col("sh")).as("h"))
      corp.join(broadcast(eval), Seq("h"))
        .groupBy("doc_id", "eval_id", "na", "nb").agg(count(lit(1)).as("i"))
        .withColumn("jacc",
          col("i").cast("double") / (col("na") + col("nb") - col("i")))
        .filter(col("jacc") >= FuzzyDecontamThreshold)
        .select("doc_id", "eval_id", "jacc")
        .orderBy("doc_id", "eval_id")
    },

    // per-source mixing weights: token counts per source plus proportional
    // and sqrt-smoothed sampling weights in integer parts-per-million.
    // Weights are INTEGER-EXACT across engines: IEEE-754 requires sqrt to
    // be correctly rounded, so floor(sqrt(BIGINT)) is deterministic, and
    // ppm = w * 1000000 div total is pure integer arithmetic (safe to
    // ~9e12 total tokens; beyond that widen to a 128-bit product). A
    // float-normalized weight would drift with partial-aggregation order.
    // Per-source aggregation output is tiny at any corpus size.
    GraftQuery("train_mix_weights",
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS n_tokens
        |      FROM documents GROUP BY source),
        |q AS (SELECT source, n_docs, n_tokens,
        |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS sq FROM s),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
        |             CAST(sum(sq) AS BIGINT) AS tots FROM q)
        |SELECT source, n_docs, n_tokens,
        |       n_tokens * 1000000 // tot AS w_prop_ppm,
        |       sq * 1000000 // tots AS w_sqrt_ppm
        |FROM q, t ORDER BY source""".stripMargin) { (spark, sfDir) =>
      val s = docs(spark, sfDir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long"))
            .as("n_tokens"))
        .withColumn("sq",
          floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      val tot = s.agg(sum("n_tokens").as("tot"), sum("sq").as("tots"))
      s.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("n_tokens * 1000000 div tot").as("w_prop_ppm"),
          expr("sq * 1000000 div tots").as("w_sqrt_ppm"))
        .orderBy("source")
    },

    // Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
    // estimation of arbitrary subset sums", JACM 2007), deterministic and
    // integer-exact: each document draws priority q = w·1e6 / (u+1) with
    // w = n_chars and u a fixed PortableHash permutation (perm 10 —
    // disjoint from the sketch tier's 1–9); the sample IS the top-k by q,
    // and the (k+1)-th priority τ yields the unbiased subset-sum
    // estimator ŵ = max(w, τ). The weighted sampler a pipeline uses to
    // audit a corpus by reading k docs while still estimating total
    // bytes/tokens of any subset. Scale: top-(k+1) plans as
    // TakeOrderedAndProject — a per-partition heap fold, no global sort,
    // no single-partition window over the corpus (the final rank runs on
    // the 51 surviving rows). Overflow: w·1e6 caps int64 at ~9.2e12
    // chars per document.
    GraftQuery("sample_priority",
      s"""WITH d AS (SELECT doc_id, n_chars AS w,
         |    ${graft.functions.PortableHash.h8Sql("lpad(CAST(doc_id AS VARCHAR), 8, '0')")} AS h
         |  FROM documents),
         |q AS (SELECT doc_id, w,
         |    (w * 1000000) // (((${graft.functions.PortableHash.permA(10)} * (h % ${graft.functions.PortableHash.P}) + ${graft.functions.PortableHash.permB(10)}) % ${graft.functions.PortableHash.P}) + 1) AS q
         |  FROM d),
         |r AS (SELECT doc_id, w, q,
         |    CAST(row_number() OVER (ORDER BY q DESC, doc_id) AS BIGINT) AS rnk FROM q),
         |tau AS (SELECT q AS t FROM r WHERE rnk = 51)
         |SELECT rnk, doc_id, w, q, greatest(w, tau.t) AS w_hat
         |FROM r, tau WHERE rnk <= 50 ORDER BY rnk""".stripMargin) { (spark, sfDir) =>
      val u = graft.functions.PortableHash.minhashPerm(
        graft.functions.PortableHash.h8(lpad(col("doc_id").cast("string"), 8, "0")), 10)
      val q = docs(spark, sfDir)
        .select(col("doc_id"), col("n_chars").as("w"), u.as("u"))
        .select(col("doc_id"), col("w"), expr("(w * 1000000) DIV (u + 1)").as("q"))
      // top-(k+1) by priority: TakeOrderedAndProject, then rank the tiny
      // survivor frame (51 rows — the global window is trivial here)
      // the rank filter below rewrites to the GLOBAL bounded-heap top-k
      // (RewriteRankLimit fires on the unpartitioned window too — the
      // constant partition key folds away and TopKPerKeyExec's empty-spec
      // AllTuples path merges the per-partition heaps); TopKPlanSpec pins
      // the shape
      val top = q.orderBy(col("q").desc, col("doc_id")).limit(51)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(lit(0)).orderBy(col("q").desc, col("doc_id"))).cast("long"))
      val tau = top.filter(col("rnk") === 51L).select(col("q").as("t"))
      top.filter(col("rnk") <= 50L).crossJoin(broadcast(tau))
        .select(col("rnk"), col("doc_id"), col("w"), col("q"),
          greatest(col("w"), col("t")).as("w_hat"))
        .orderBy("rnk")
    },

    // Mixture MATERIALIZATION — the stage after train_mix_weights: given
    // the sqrt-of-size target shares (ppm), pick the LARGEST epoch T that
    // every source can serve without upsampling (T = min_s n_s·1e6/w_s),
    // derive each source's keep count, and select exactly those documents
    // deterministically (md5-rank within source — reproducible on any
    // cluster/partitioning/engine). Output is the per-source audit row
    // with a kept_sum checksum pinning the exact selection, so the result
    // stays 1 row per source at any corpus size. Overflow bound:
    // n_avail·1e6 caps int64 at ~9.2e12 docs per source — beyond any real
    // corpus's doc count. Scale: two tiny aggregates (one row per source)
    // broadcast back; the per-source rank window partitions by source —
    // at extreme per-source cardinality swap in the hash-threshold cut
    // (keep if md5 below the keep_n/n_avail quantile), the same selection
    // shape as one scan. Sources whose ppm share floors to 0 are excluded
    // from the epoch cap and keep nothing (both engines agree).
    GraftQuery("train_mix_resample",
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_avail
        |  FROM documents GROUP BY source),
        |q AS (SELECT source, n_avail,
        |        CAST(floor(sqrt(CAST(n_avail AS DOUBLE))) AS BIGINT) AS w FROM s),
        |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM q),
        |p AS (SELECT source, n_avail, w * 1000000 // tot AS w_ppm FROM q, tw),
        |cap AS (SELECT CAST(min(n_avail * 1000000 // w_ppm) AS BIGINT) AS t
        |        FROM p WHERE w_ppm > 0),
        |k AS (SELECT source, n_avail, w_ppm,
        |        CAST(t * w_ppm // 1000000 AS BIGINT) AS keep_n FROM p, cap),
        |r AS (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |      FROM documents),
        |sel AS (SELECT r.source, CAST(count(*) AS BIGINT) AS kept_n,
        |          CAST(sum(r.doc_id) AS BIGINT) AS kept_sum
        |        FROM r JOIN k ON k.source = r.source AND r.rnk <= k.keep_n
        |        GROUP BY r.source)
        |SELECT k.source, k.n_avail, k.w_ppm, k.keep_n,
        |       CAST(coalesce(sel.kept_n, 0) AS BIGINT) AS kept_n,
        |       CAST(coalesce(sel.kept_sum, 0) AS BIGINT) AS kept_sum
        |FROM k LEFT JOIN sel ON sel.source = k.source
        |ORDER BY k.source""".stripMargin) { (spark, sfDir) =>
      val s = docs(spark, sfDir).groupBy("source").agg(count(lit(1)).as("n_avail"))
        .withColumn("w", floor(sqrt(col("n_avail").cast("double"))).cast("long"))
      val tw = s.agg(sum("w").as("tot"))
      val p = s.crossJoin(broadcast(tw))
        .select(col("source"), col("n_avail"), expr("w * 1000000 DIV tot").as("w_ppm"))
      val cap = p.filter(col("w_ppm") > 0)
        .agg(min(expr("n_avail * 1000000 DIV w_ppm")).as("t"))
      val k = p.crossJoin(broadcast(cap))
        .select(col("source"), col("n_avail"), col("w_ppm"),
          expr("t * w_ppm DIV 1000000").as("keep_n"))
      val r = docs(spark, sfDir)
        .select(col("source"), col("doc_id"),
          md5(col("doc_id").cast("string").cast("binary")).as("h"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("h"), col("doc_id"))).cast("long"))
      val sel = r.join(broadcast(k.select("source", "keep_n")), Seq("source"))
        .filter(col("rnk") <= col("keep_n"))
        .groupBy("source").agg(count(lit(1)).as("kept_n"), sum("doc_id").as("kept_sum"))
      k.join(sel, Seq("source"), "left_outer")
        .select(col("source"), col("n_avail"), col("w_ppm"), col("keep_n"),
          coalesce(col("kept_n"), lit(0L)).as("kept_n"),
          coalesce(col("kept_sum"), lit(0L)).as("kept_sum"))
        .orderBy("source")
    },

    // deterministic global shuffle: every document gets a reproducible
    // training-order position = its rank under md5(doc_id) — the
    // hash-then-sort shuffle every epoch pipeline needs (same order on any
    // cluster, any partitioning, any engine). The rank is the two-phase
    // distributed prefix rank (range-partition on the hash, local
    // row_number, broadcast per-partition offsets) — NO single-partition
    // global window; only one long per partition reaches the driver.
    GraftQuery("train_shuffle_order",
      """SELECT doc_id,
        |       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |            AS BIGINT) AS pos
        |FROM documents ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
      val keyed = docs(spark, sfDir)
        .select(col("doc_id"),
          md5(col("doc_id").cast("string").cast("binary")).as("k"))
      TwoPhaseRank.rowNumber(keyed, "pos", -1, col("k"), col("doc_id"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"))
        .orderBy("doc_id")
    },

    // DSIR-style data selection (Xie et al., "Data Selection for Language
    // Models via Importance Resampling", NeurIPS 2023), made deterministic:
    // the hashed-ngram log-likelihood ratio becomes an integer-ppm count
    // ratio per bigram feature — affinity(f) = (count_eval(f) · 1e6) DIV
    // count_corpus(f), no smoothing, no logs, no libm drift — summed over
    // each training document's bigram occurrences; the importance RESAMPLE
    // becomes the deterministic top-⌈10%⌉ by mean affinity (IEEE quotient,
    // identical in both engines) with doc_id tiebreak. Scale shape: the
    // affinity table is keyed by eval∩corpus bigrams (benchmarks are small
    // by nature → broadcast), the corpus side is one linear scan + one
    // per-doc aggregation, and the global rank is the two-phase prefix
    // rank — no single-partition window, no all-pairs stage. Documents
    // with fewer than 2 tokens have no features and are unscoreable (not
    // emitted — both engines derive the population from the bigram rows).
    GraftQuery("train_dsir_select",
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |        i -> concat(toks[i], ' ', toks[i + 1]))) AS bg FROM t),
        |tc AS (SELECT bg, CAST(count(*) AS BIGINT) AS ct FROM b
        |       WHERE doc_id % 50 = 7 GROUP BY bg),
        |rc AS (SELECT bg, CAST(count(*) AS BIGINT) AS cr FROM b
        |       WHERE doc_id % 50 <> 7 GROUP BY bg),
        |aff AS (SELECT bg, (ct * 1000000) // cr AS a FROM tc JOIN rc USING (bg)),
        |sc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |         CAST(sum(COALESCE(aff.a, 0)) AS BIGINT) AS affinity
        |       FROM b LEFT JOIN aff USING (bg)
        |       WHERE b.doc_id % 50 <> 7 GROUP BY b.doc_id),
        |k AS (SELECT CAST(ceil(0.1 * count(*)) AS BIGINT) AS kk FROM sc),
        |r AS (SELECT doc_id, n_bigrams, affinity,
        |        CAST(row_number() OVER (
        |          ORDER BY CAST(affinity AS DOUBLE) / n_bigrams DESC, doc_id)
        |          AS BIGINT) AS rnk
        |      FROM sc)
        |SELECT doc_id, n_bigrams, affinity,
        |       (affinity * 100) // n_bigrams AS avg100,
        |       rnk, CASE WHEN rnk <= (SELECT kk FROM k) THEN 1 ELSE 0 END AS selected
        |FROM r ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
      // persist the tokenize+explode ONCE: it feeds the eval-count agg,
      // the corpus-count agg (both inside the aff broadcast build) and
      // the corpus scoring scan — unpersisted, the regexp tokenization
      // would run three times over the documents table
      val bg = docs(spark, sfDir)
        .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
        .select(col("doc_id"), explode(expr(gramsExpr(2))).as("bg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.CacheTracker.track(bg)
      val tc = bg.filter(isEvalDoc).groupBy("bg").agg(count(lit(1)).as("ct"))
      val rc = bg.filter(!isEvalDoc).groupBy("bg").agg(count(lit(1)).as("cr"))
      val aff = tc.join(rc, Seq("bg"))
        .select(col("bg"), expr("(ct * 1000000) DIV cr").as("a"))
      // persisted only to pin the frame between the k-count action and
      // TwoPhaseRank's materialization (rowNumber itself unpersists its
      // input after the range-sampling pass, so no tracker entry here)
      val scored = bg.filter(!isEvalDoc)
        .join(broadcast(aff), Seq("bg"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(coalesce(col("a"), lit(0L))).as("affinity"))
        .withColumn("avgd", col("affinity").cast("double") / col("n_bigrams"))
        .persist()
      val k = math.ceil(0.1 * scored.count()).toLong
      TwoPhaseRank.rowNumber(scored, "rnk", -1, col("avgd").desc, col("doc_id"))
        .select(col("doc_id"), col("n_bigrams"), col("affinity"),
          // integer-exact published mean (a 2-dp float round can land on a
          // .xx5 boundary where the engines' round primitives disagree)
          expr("(affinity * 100) DIV n_bigrams").as("avg100"),
          col("rnk").cast("long").as("rnk"),
          when(col("rnk") <= k, 1).otherwise(0).as("selected"))
        .orderBy("doc_id")
    },

    // Document chunking for embedding/retrieval pipelines: split every
    // document into overlapping fixed-width windows (W=200 chars, stride
    // S=150 → 50-char overlap so no boundary phrase is lost), emitting
    // one content-addressed row per chunk — (doc_id, chunk_id, start_pos,
    // chunk_len, chunk_md5). n_chunks = ceil((len-W)/S)+1, min 1, so the
    // final window always reaches the end of the document. Per-row
    // explode only: linear in total text, no shuffle, no join — the shape
    // that feeds a 100 TB corpus into an embedding model in one pass;
    // md5 travels instead of the chunk text so the verify frame stays
    // narrow while pinning the exact chunk CONTENT, not just offsets.
    GraftQuery("train_chunk_windows",
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |n AS (SELECT doc_id, text, len,
        |        CASE WHEN len <= 200 THEN 1
        |             ELSE ((len - 200 + 149) // 150) + 1 END AS n_chunks
        |      FROM d),
        |c AS (SELECT doc_id, text, len,
        |        unnest(generate_series(0, CAST(n_chunks - 1 AS BIGINT))) AS k
        |      FROM n)
        |SELECT doc_id, k AS chunk_id,
        |  CAST(1 + k * 150 AS BIGINT) AS start_pos,
        |  CAST(length(substring(text, CAST(1 + k * 150 AS INT), 200)) AS BIGINT) AS chunk_len,
        |  md5(substring(text, CAST(1 + k * 150 AS INT), 200)) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (spark, sfDir) =>
      docs(spark, sfDir)
        .selectExpr("doc_id", "text", "length(text) AS len")
        .selectExpr("doc_id", "text",
          "CASE WHEN len <= 200 THEN 1 ELSE ((len - 200 + 149) DIV 150) + 1 END AS n_chunks")
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0L, n_chunks - 1)")).as("k"))
        .selectExpr("doc_id", "k AS chunk_id",
          "CAST(1 + k * 150 AS BIGINT) AS start_pos",
          "CAST(length(substring(text, CAST(1 + k * 150 AS INT), 200)) AS BIGINT) AS chunk_len",
          "md5(CAST(substring(text, CAST(1 + k * 150 AS INT), 200) AS BINARY)) AS chunk_md5")
        .orderBy("doc_id", "chunk_id")
    },

    // Budgeted data selection: keep the highest-quality documents whose
    // cumulative token count fits a budget (half the corpus's tokens,
    // data-derived) — the "best data under a token budget" op every
    // pretraining mix ends with (the greedy prefix is optimal for a
    // per-token quality objective). Quality = lexical diversity in ppm
    // (distinct/total tokens), ties by doc_id; the global quality ordering
    // uses the distributed two-phase rank and the budget prefix is ONE
    // bounded window over per-rank-partition subtotals — same shape as
    // pack_nextfit_dist, no single-partition cumsum. Report is per source:
    // how the budget redistributes the mix (diversity-ranked selection
    // systematically reweights sources — that's the number shipped).
    GraftQuery("train_token_budget",
      """WITH t AS (SELECT doc_id, source,
        |        regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
        |f AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS nt,
        |        CASE WHEN len(toks) = 0 THEN 0
        |             ELSE (1000000 * CAST(len(list_distinct(toks)) AS BIGINT))
        |                  // CAST(len(toks) AS BIGINT) END AS score_ppm
        |      FROM t),
        |b AS (SELECT CAST(sum(nt) AS BIGINT) // 2 AS budget FROM f),
        |r AS (SELECT f.*, row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rn
        |      FROM f),
        |c AS (SELECT r.*, CAST(sum(nt) OVER (ORDER BY rn
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM r),
        |sel AS (SELECT c.*, (cum <= (SELECT budget FROM b)) AS keep FROM c)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS tok_total,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
        |  CAST(sum(CASE WHEN keep THEN nt ELSE 0 END) AS BIGINT) AS tok_sel,
        |  CAST(sum(CASE WHEN keep THEN nt ELSE 0 END) * 1000000
        |       // CAST(sum(nt) AS BIGINT) AS BIGINT) AS sel_ppm
        |FROM sel GROUP BY source ORDER BY source""".stripMargin) { (spark, sfDir) =>
      import spark.implicits._
      val f = Tables.documents(spark, sfDir)
        .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
        .select(col("doc_id"), col("source"),
          size(col("toks")).cast("long").as("nt"),
          expr("CASE WHEN size(toks) = 0 THEN 0L ELSE " +
            "(1000000 * CAST(size(array_distinct(toks)) AS BIGINT)) " +
            "DIV CAST(size(toks) AS BIGINT) END").as("score_ppm"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.CacheTracker.track(f)
      val budget = f.agg(sum("nt")).head().getLong(0) / 2
      // distributed rank by quality, then the budget prefix: per-partition
      // token subtotals (bounded: one long per partition) provide the
      // cross-partition offsets, the ROWS window runs within partitions
      val ranked = TwoPhaseRank.rowNumber(f, "rn", -1,
          col("score_ppm").desc, col("doc_id").asc)
        .repartitionByRange(col("rn"))
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.CacheTracker.track(ranked)
      val offs = ranked.groupBy("__pid").agg(sum("nt").as("s"))
        .orderBy("__pid").as[(Int, Long)].collect()
      val offDf = offs.map(_._1)
        .zip(offs.scanLeft(0L) { case (acc, (_, s)) => acc + s }.dropRight(1))
        .toSeq.toDF("__pid", "__off")
      val w = Window.partitionBy("__pid").orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ranked
        .join(broadcast(offDf), Seq("__pid"))
        .withColumn("keep", (sum("nt").over(w) + col("__off")) <= budget)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("tok_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sel"),
          sum(when(col("keep"), col("nt")).otherwise(0L)).as("tok_sel"))
        .select(col("source"), col("n_docs"), col("tok_total"), col("n_sel"),
          col("tok_sel"), expr("tok_sel * 1000000 DIV tok_total").as("sel_ppm"))
        .orderBy("source")
    }
  )
}
