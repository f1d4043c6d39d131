package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline (north-star): image/audio/video travel as
  * opaque `binary` columns with typed metadata, and feature extraction
  * runs batched and partition-parallel over them with `mapPartitions` on
  * a typed Dataset — the Scala analogue of a Pandas-UDF/`mapInPandas`
  * stage.
  *
  * The decode step is REAL (round 6): payloads are standard 24-bpp BMP
  * rasters, RIFF/WAVE PCM16 audio, and concatenated-BMP video streams,
  * parsed by the pure-JVM [[BmpCodec]]/[[WavCodec]] — header validation,
  * stride/padding, bottom-up row un-mirroring, RIFF chunk walking. The
  * payload bytes are synthesized by [[MediaSynth]]'s closed-form pixel /
  * sample functions (no image libraries exist in this environment to
  * emit them), which is exactly what lets the decode path be ORACLED:
  * DuckDB states what a correct decode must recover without parsing a
  * byte, so any codec bug breaks the multimodal_decode / multimodal_wav /
  * multimodal_video_frames checksums.
  *
  * Scale shape: the binary column travels with its row (no driver
  * collection), extraction is embarrassingly parallel per partition, and
  * downstream ops see a plain columnar feature table.
  */
object MediaPipeline {

  /** one media object: opaque payload + typed metadata (width/height are
    * raster dims for image/video; (n_samples, 1) for audio) */
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
      histogram: Array[Long], // 16-bin content histogram (decoded domain)
      brightness: Double)

  def kindOf(docId: Long): String = (docId % 3) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }

  /** derive a deterministic media table from `documents`: REAL encoded
    * payloads (BMP / WAV / concatenated-BMP video) per [[MediaSynth]] */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        kindOf(d) match {
          case "image" =>
            MediaRow(d, "image", MediaSynth.bmpFor(d), MediaSynth.imgW(d), MediaSynth.imgH(d))
          case "audio" =>
            MediaRow(d, "audio", MediaSynth.wavFor(d), MediaSynth.wavN(d), 1)
          case _ =>
            MediaRow(d, "video", MediaSynth.videoFor(d), MediaSynth.imgW(d), MediaSynth.imgH(d))
        }
      })
  }

  /** luminance-ish integer weight shared by features, queries, and the
    * DuckDB oracles: 2r + 5g + b (integer so every checksum is exact) */
  @inline private[multimodal] def lum(r: Int, g: Int, b: Int): Int = 2 * r + 5 * g + b

  /** features of one decoded raster, position-weighted so row-order /
    * stride bugs change the checksum: Σ (y·w+x+1)·lum, 16-bin histogram
    * over channel bytes, mean channel value */
  private def rasterFeatures(dec: BmpCodec.Decoded, frameWeight: Long,
      hist: Array[Long]): (Long, Long, Long) = {
    var checksum = 0L
    var channelSum = 0L
    var i = 0
    val n = dec.w * dec.h
    while (i < n) {
      val r = dec.rgb(i * 3) & 0xff
      val g = dec.rgb(i * 3 + 1) & 0xff
      val b = dec.rgb(i * 3 + 2) & 0xff
      checksum += frameWeight * (i + 1) * lum(r, g, b)
      channelSum += r + g + b
      hist(r >> 4) += 1; hist(g >> 4) += 1; hist(b >> 4) += 1
      i += 1
    }
    (checksum, channelSum, 3L * n)
  }

  /** partition-parallel REAL decode + feature extraction — the
    * mapInPandas-shaped stage. Dispatch is by payload magic (not the kind
    * column), as a real pipeline's sniffing decode would. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val hist = new Array[Long](16)
      val bytes = r.bytes
      if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
        // one or more concatenated BMP frames (image: exactly one)
        val frames = BmpCodec.decodeFrames(bytes)
        var checksum = 0L; var chSum = 0L; var chN = 0L
        frames.zipWithIndex.foreach { case (dec, f) =>
          val (c, s, n) = rasterFeatures(dec, f + 1L, hist)
          checksum += c; chSum += s; chN += n
        }
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong, checksum, hist,
          if (chN == 0) 0.0 else chSum.toDouble / chN / 255.0)
      } else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') {
        val dec = WavCodec.decode(bytes)
        var checksum = 0L; var absSum = 0L
        var i = 0
        while (i < dec.samples.length) {
          val s = dec.samples(i).toInt
          checksum += (i + 1).toLong * s
          absSum += math.abs(s)
          hist((s + 32768) >> 12) += 1
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong, checksum, hist,
          if (dec.samples.isEmpty) 0.0
          else absSum.toDouble / dec.samples.length / 32768.0)
      } else {
        throw new IllegalArgumentException(
          s"media ${r.media_id}: unrecognized payload magic")
      }
    })
  }

  /** REAL resize for raster payloads: decode → nearest-neighbour resample
    * → re-encode. Video payloads resample every frame; audio passes
    * through untouched (resampling PCM is a rate conversion, not a raster
    * op). The Spark shape — binary in, smaller binary + new dims out — is
    * the production one. */
  def resize(media: Dataset[MediaRow], w2: Int, h2: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.bytes.length >= 2 && r.bytes(0) == 'B' && r.bytes(1) == 'M') {
        val out = BmpCodec.decodeFrames(r.bytes)
          .map(d => BmpCodec.encode(w2, h2, BmpCodec.resample(d, w2, h2).rgb))
          .reduce(_ ++ _)
        r.copy(bytes = out, width = w2, height = h2)
      } else r
    })
  }

  /** REAL frame sampling for "video" payloads: walk the concatenated-BMP
    * container by each frame's declared size, decode every k-th frame,
    * extract features over the kept frames. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.map { r =>
      val frames = BmpCodec.decodeFrames(r.bytes)
      val kept = frames.indices.by(everyK.max(1)).map(frames)
      val hist = new Array[Long](16)
      var checksum = 0L; var chSum = 0L; var chN = 0L; var nBytes = 0L
      kept.zipWithIndex.foreach { case (dec, f) =>
        val (c, s, n) = rasterFeatures(dec, f + 1L, hist)
        checksum += c; chSum += s; chN += n
        nBytes += BmpCodec.encodedSize(dec.w, dec.h).toLong
      }
      MediaFeatures(r.media_id, r.kind, nBytes, checksum, hist,
        if (chN == 0) 0.0 else chSum.toDouble / chN / 255.0)
    })
  }

  /** Perceptual average-hash over a decoded raster: nearest-neighbour
    * resample to 8×8 ([[BmpCodec.resample]] — the real resize), integer
    * luminance per cell, bit j set iff lum_j·64 > Σlum (strictly above
    * the mean, scaled so no division ever rounds). Returned split into
    * (hi, lo) 32-bit halves: bit 63 of a packed long flips its sign,
    * which neither engine-portable SQL nor a hamming-bucket join wants
    * to reason about. Near-duplicate images differ in few bits (the
    * aHash family's standard property), so the hash feeds the same
    * banded-bucket join shape as SimHash. */
  def aHash(dec: BmpCodec.Decoded): (Long, Long, Long) = {
    val down = BmpCodec.resample(dec, 8, 8)
    val lums = Array.tabulate(64) { i =>
      (lum(down.rgb(i * 3) & 0xff, down.rgb(i * 3 + 1) & 0xff,
        down.rgb(i * 3 + 2) & 0xff)).toLong
    }
    val total = lums.sum
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 64) {
      if (lums(i) * 64 > total) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo, total)
  }

  /** end-to-end: media table → real decode → per-kind aggregate profile */
  def kindProfile(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        round(avg("brightness"), 6).as("avg_brightness"))
      .orderBy("kind")
}
