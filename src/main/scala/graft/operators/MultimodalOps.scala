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
    }
  )
}
