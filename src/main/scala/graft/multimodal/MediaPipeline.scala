package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run batched
  * feature-extraction over them with `mapPartitions` on a typed Dataset —
  * the Scala analogue of a Pandas-UDF/`mapInPandas` stage.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * environment): `FakeDecoder` derives deterministic pseudo-features from
  * the bytes. Everything around it — schema, row shape, batching,
  * partition-parallel execution — is the real 100 TB design: the binary
  * column travels with its row (no driver collection), extraction is
  * embarrassingly parallel per partition, and downstream ops see a plain
  * columnar feature table.
  */
object MediaPipeline {

  /** one media object: opaque payload + typed metadata */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int)

  /** extracted features: fixed-width vector + scalar stats */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      histogram: Array[Long], // 16-bin byte histogram
      brightness: Double)

  /** STUB decoder — deterministic stand-in for image/audio decoding.
    * A real deployment swaps this for an actual codec; the Spark-side
    * contract (bytes in, fixed-schema features out) is unchanged. */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Array[Long], Double) = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      val brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0
      (hist, brightness)
    }
  }

  /** derive a deterministic media table from `documents` (UTF-8 bytes stand
    * in for encoded media payloads) */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        (lit(1) + col("n_chars") % 64).cast("int").as("width"),
        (lit(1) + (col("n_chars") * 7) % 64).cast("int").as("height"))
      .as[MediaRow]
  }

  /** partition-parallel feature extraction — the mapInPandas-shaped stage */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (hist, brightness) = FakeDecoder.decode(r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
          hist.zipWithIndex.map { case (c, i) => c * (i * 16 + 8) }.sum,
          hist, brightness)
      }
    }
  }

  /** STUB resize: deterministic downsample of the byte payload to a w'×h'
    * pseudo-raster (a real deployment decodes + rescales pixels; the Spark
    * shape — binary in, smaller binary + new dims out — is identical). */
  def resize(media: Dataset[MediaRow], w2: Int, h2: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val n = (w2 * h2).max(1)
      val out = new Array[Byte](math.min(n, r.bytes.length.max(1)))
      var i = 0
      while (i < out.length) {
        out(i) = r.bytes((i.toLong * r.bytes.length / out.length).toInt)
        i += 1
      }
      r.copy(bytes = out, width = w2, height = h2)
    }
  }

  /** STUB frame sampling for "video" payloads: split the byte stream into
    * `frames` equal windows and keep the first byte-block of every k-th —
    * the mapPartitions shape of real frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], frames: Int, everyK: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.map { r =>
        val flen = (r.bytes.length / frames.max(1)).max(1)
        val kept = (0 until frames by everyK.max(1))
          .flatMap(f => r.bytes.slice(f * flen, f * flen + flen)).toArray
        val (hist, brightness) = FakeDecoder.decode(kept)
        MediaFeatures(r.media_id, r.kind, kept.length.toLong,
          hist.zipWithIndex.map { case (c, i) => c * (i * 16 + 8) }.sum,
          hist, brightness)
      }
    }
  }

  /** end-to-end: media table → features → per-kind aggregate profile */
  def kindProfile(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        round(avg("brightness"), 6).as("avg_brightness"))
      .orderBy("kind")
}
