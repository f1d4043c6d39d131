package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables

/** Oracle-checkable slice of the multimodal surface: opaque binary payloads
  * (UTF-8 encoded text standing in for image bytes) with typed metadata
  * derived deterministically. The real decode/feature-extract plumbing —
  * schema, partitioning, batched extraction over binary columns — lives in
  * graft.multimodal.MediaPipeline (stubbed decoder, tested in
  * MultimodalSpec); this query pins down the byte-level semantics both
  * engines agree on.
  */
object MultimodalOps {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery("multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(generate_series(1, length(text)),
        |    i -> ascii(substr(text, i, 1)))) AS BIGINT) AS checksum,
        |  CAST(1 + octet_length(encode(text)) % 64 AS BIGINT) AS w,
        |  CAST(1 + (octet_length(encode(text)) * 7) % 64 AS BIGINT) AS h
        |FROM documents ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .withColumn("bytes", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          length(col("bytes")).cast("long").as("n_bytes"),
          expr("aggregate(transform(sequence(1, length(text)), i -> " +
            "CAST(ascii(substring(text, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), " +
            "(a, x) -> a + x)").as("checksum"),
          (lit(1) + length(col("bytes")) % 64).cast("long").as("w"),
          (lit(1) + (length(col("bytes")) * 7) % 64).cast("long").as("h"))
        .orderBy("doc_id")
    },

    // asset-level dedup over the opaque binary payload: exact identity is
    // md5 over the bytes (modality-agnostic — works for any blob), and
    // near-identity is a perceptual-hash stand-in that buckets assets by a
    // quantized content-composition signature (per-class byte histograms —
    // the same bucket-then-verify shape a real pHash/aHash pipeline uses,
    // with the codec-dependent hash swapped out in MediaPipeline). Emits
    // every near-bucket with >= 2 members plus its exact-distinct count,
    // so exact-dup subsets inside a near-bucket are visible.
    GraftQuery("multimodal_dedup",
      """WITH h AS (SELECT doc_id, md5(text) AS xh,
        |    CAST(len(regexp_extract_all(text, '[a-z]')) // 32 AS BIGINT) AS b_alpha,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) // 8 AS BIGINT) AS b_digit,
        |    CAST(len(regexp_extract_all(text, ' ')) // 16 AS BIGINT) AS b_space,
        |    CAST(octet_length(encode(text)) // 64 AS BIGINT) AS b_bytes
        |  FROM documents)
        |SELECT b_alpha, b_digit, b_space, b_bytes,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT xh) AS BIGINT) AS n_exact,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM h GROUP BY b_alpha, b_digit, b_space, b_bytes HAVING count(*) >= 2
        |ORDER BY b_alpha, b_digit, b_space, b_bytes""".stripMargin) { (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .withColumn("bytes", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), md5(col("text").cast("binary")).as("xh"),
          expr("CAST(size(regexp_extract_all(text, '[a-z]', 0)) AS BIGINT) DIV 32").as("b_alpha"),
          expr("CAST(size(regexp_extract_all(text, '[0-9]', 0)) AS BIGINT) DIV 8").as("b_digit"),
          expr("CAST(size(regexp_extract_all(text, ' ', 0)) AS BIGINT) DIV 16").as("b_space"),
          expr("CAST(length(bytes) AS BIGINT) DIV 64").as("b_bytes"))
        .groupBy("b_alpha", "b_digit", "b_space", "b_bytes")
        .agg(count(lit(1)).as("n"), countDistinct(col("xh")).as("n_exact"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .filter(col("n") >= 2)
        .orderBy("b_alpha", "b_digit", "b_space", "b_bytes")
    },

    // frame-sampling schedule: the video analogue of chunk_plan — given
    // per-asset duration/fps metadata (derived deterministically from the
    // payload here; from a container probe in production), emit the
    // 1-frame-per-second sampling plan (sample_idx, ts_ms, native frame
    // number) each decode task executes. The schedule is pure relational
    // fan-out (sequence + explode), so Spark parallelizes per asset and
    // the decoder (MediaPipeline) stays a dumb per-row consumer.
    GraftQuery("multimodal_frame_plan",
      """WITH m AS (SELECT doc_id,
        |    1000 + (octet_length(encode(text)) * 13) % 60000 AS duration_ms,
        |    1 + octet_length(encode(text)) % 30 AS fps
        |  FROM documents),
        |f AS (SELECT doc_id, duration_ms, fps,
        |    unnest(generate_series(0, duration_ms - 1, 1000)) AS ts_ms FROM m)
        |SELECT doc_id, CAST(ts_ms // 1000 AS BIGINT) AS sample_idx,
        |       CAST(ts_ms AS BIGINT) AS ts_ms,
        |       CAST(ts_ms * fps // 1000 AS BIGINT) AS frame_no
        |FROM f ORDER BY doc_id, sample_idx""".stripMargin) { (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .withColumn("n_bytes", length(encode(col("text"), "UTF-8")).cast("long"))
        .select(col("doc_id"),
          (lit(1000L) + (col("n_bytes") * 13) % 60000).as("duration_ms"),
          (lit(1L) + col("n_bytes") % 30).as("fps"))
        .select(col("doc_id"), col("fps"),
          explode(sequence(lit(0L), col("duration_ms") - 1, lit(1000L))).as("ts_ms"))
        .select(col("doc_id"),
          expr("ts_ms DIV 1000").as("sample_idx"),
          col("ts_ms"),
          expr("ts_ms * fps DIV 1000").as("frame_no"))
        .orderBy("doc_id", "sample_idx")
    }
  )
}
