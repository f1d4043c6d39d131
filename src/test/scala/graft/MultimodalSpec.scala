package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{BmpCodec, MediaPipeline, MediaSynth, WavCodec}

/** multimodal tier: REAL pure-JVM BMP/WAV decode + partition-parallel
  * extraction. Golden byte fixtures are written out literally (computed by
  * hand from the published BMP/RIFF layouts), so the codecs are pinned
  * against the format spec — not just against our own encoder. */
class MultimodalSpec extends AnyFunSuite {

  // 2×2 24-bpp BMP: pixels (top-down) red, green / blue, white.
  // stride = (2*3+3)&~3 = 8 → 2 pad bytes per row; rows stored bottom-up.
  private val goldenBmp: Array[Byte] = Array[Int](
    0x42, 0x4d, // 'BM'
    0x46, 0, 0, 0, // file size 70
    0, 0, 0, 0, // reserved
    0x36, 0, 0, 0, // pixel data offset 54
    0x28, 0, 0, 0, // info header size 40
    0x02, 0, 0, 0, // width 2
    0x02, 0, 0, 0, // height 2 (positive → bottom-up)
    0x01, 0, // planes
    0x18, 0, // 24 bpp
    0, 0, 0, 0, // BI_RGB
    0x10, 0, 0, 0, // image size 16
    0x13, 0x0b, 0, 0, // 2835 ppm
    0x13, 0x0b, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, // palette counts
    // row y=1 (stored first): blue(B=ff) white(ff ff ff) + 2 pad
    0xff, 0x00, 0x00, 0xff, 0xff, 0xff, 0, 0,
    // row y=0: red(B=0,G=0,R=ff) green(00 ff 00) + 2 pad
    0x00, 0x00, 0xff, 0x00, 0xff, 0x00, 0, 0,
  ).map(_.toByte)

  private val goldenRgb: Array[Byte] = Array[Int](
    255, 0, 0, 0, 255, 0, // top row: red, green
    0, 0, 255, 255, 255, 255, // bottom row: blue, white
  ).map(_.toByte)

  // PCM16 mono, 8000 Hz, samples [1000, -1000, 32767, -32768]
  private val goldenWav: Array[Byte] = Array[Int](
    0x52, 0x49, 0x46, 0x46, // 'RIFF'
    0x2c, 0, 0, 0, // 36 + 8
    0x57, 0x41, 0x56, 0x45, // 'WAVE'
    0x66, 0x6d, 0x74, 0x20, // 'fmt '
    0x10, 0, 0, 0, // 16
    0x01, 0, // PCM
    0x01, 0, // mono
    0x40, 0x1f, 0, 0, // 8000
    0x80, 0x3e, 0, 0, // byte rate 16000
    0x02, 0, // block align
    0x10, 0, // 16 bits
    0x64, 0x61, 0x74, 0x61, // 'data'
    0x08, 0, 0, 0, // 8 bytes
    0xe8, 0x03, // 1000
    0x18, 0xfc, // -1000
    0xff, 0x7f, // 32767
    0x00, 0x80, // -32768
  ).map(_.toByte)

  test("golden BMP bytes decode to the spec'd raster and re-encode bit-exactly") {
    val dec = BmpCodec.decode(goldenBmp)
    assert(dec.w == 2 && dec.h == 2)
    assert(dec.rgb.toSeq == goldenRgb.toSeq)
    assert(BmpCodec.encode(2, 2, goldenRgb).toSeq == goldenBmp.toSeq)
  }

  test("golden WAV bytes decode to the spec'd samples and re-encode bit-exactly") {
    val dec = WavCodec.decode(goldenWav)
    assert(dec.sampleRate == 8000)
    assert(dec.samples.toSeq == Seq[Short](1000, -1000, 32767, -32768))
    assert(WavCodec.encode(8000, Array[Short](1000, -1000, 32767, -32768)).toSeq
      == goldenWav.toSeq)
  }

  test("BMP roundtrip recovers the closed-form raster across stride paddings") {
    // w = 1..16 covers every stride-padding residue (w*3 mod 4)
    (0L to 40L).foreach { d =>
      val dec = BmpCodec.decode(MediaSynth.bmpFor(d))
      assert(dec.w == MediaSynth.imgW(d) && dec.h == MediaSynth.imgH(d))
      assert(dec.rgb.toSeq ==
        MediaSynth.raster(d, 0L, dec.w, dec.h).toSeq, s"doc $d")
    }
  }

  test("WAV roundtrip recovers the closed-form samples and header fields") {
    (0L to 20L).foreach { d =>
      val dec = WavCodec.decode(MediaSynth.wavFor(d))
      assert(dec.sampleRate == MediaSynth.wavRate(d))
      assert(dec.samples.length == MediaSynth.wavN(d))
      dec.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == MediaSynth.sample(d, i))
      }
    }
  }

  test("WAV chunk walk skips unknown chunks by declared size") {
    val base = WavCodec.encode(16000, Array[Short](7, -7, 300))
    // splice a LIST chunk (id + size + 6 payload bytes) between fmt and data
    val extra = Array[Int](0x4c, 0x49, 0x53, 0x54, 6, 0, 0, 0,
      1, 2, 3, 4, 5, 6).map(_.toByte)
    val spliced = base.slice(0, 36) ++ extra ++ base.slice(36, base.length)
    // fix the RIFF size field (+14)
    spliced(4) = ((base.length - 8 + 14) & 0xff).toByte
    val dec = WavCodec.decode(spliced)
    assert(dec.sampleRate == 16000)
    assert(dec.samples.toSeq == Seq[Short](7, -7, 300))
  }

  test("malformed payloads fail loudly, not silently") {
    intercept[IllegalArgumentException](BmpCodec.decode(goldenBmp.take(20)))
    intercept[IllegalArgumentException](BmpCodec.decode(goldenWav))
    intercept[IllegalArgumentException](WavCodec.decode(goldenBmp))
    val badBpp = goldenBmp.clone; badBpp(28) = 8 // 8-bpp palette BMP
    intercept[IllegalArgumentException](BmpCodec.decode(badBpp))
    val compressed = goldenBmp.clone; compressed(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](BmpCodec.decode(compressed))
  }

  test("video container walk frames the stream by each declared size") {
    val d = 11L // video kind (11 % 3 = 2)
    val frames = BmpCodec.decodeFrames(MediaSynth.videoFor(d))
    assert(frames.length == MediaSynth.VideoFrames)
    frames.zipWithIndex.foreach { case (dec, f) =>
      assert(dec.w == MediaSynth.imgW(d) && dec.h == MediaSynth.imgH(d))
      assert(dec.rgb.toSeq == MediaSynth.raster(d, f.toLong, dec.w, dec.h).toSeq)
    }
  }

  test("nearest-neighbour resample picks the mapped source pixels") {
    val dec = BmpCodec.decode(goldenBmp)
    val down = BmpCodec.resample(dec, 1, 1)
    assert(down.rgb.toSeq == Seq[Byte](-1, 0, 0)) // (0,0) → red
    val up = BmpCodec.resample(dec, 4, 4)
    assert(up.w == 4 && up.h == 4)
    // corner pixels map back to the four sources
    assert(up.rgb.slice(0, 3).toSeq == Seq[Byte](-1, 0, 0)) // red
    assert(up.rgb.slice(45, 48).toSeq == Seq[Byte](-1, -1, -1)) // white
  }

  test("feature extraction REALLY decodes every modality, partition-parallel") {
    val spark = TestSpark.spark
    val media = MediaPipeline.mediaTable(spark, TestSpark.Sf)
    val feats = MediaPipeline.extractFeatures(media).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      f.kind match {
        case "image" =>
          val (w, h) = (MediaSynth.imgW(f.media_id), MediaSynth.imgH(f.media_id))
          assert(f.n_bytes == BmpCodec.encodedSize(w, h))
          assert(f.histogram.sum == 3L * w * h) // one bin hit per channel byte
        case "audio" =>
          assert(f.n_bytes == WavCodec.encodedSize(MediaSynth.wavN(f.media_id)))
          assert(f.histogram.sum == MediaSynth.wavN(f.media_id).toLong)
        case "video" =>
          val (w, h) = (MediaSynth.imgW(f.media_id), MediaSynth.imgH(f.media_id))
          assert(f.n_bytes ==
            MediaSynth.VideoFrames.toLong * BmpCodec.encodedSize(w, h))
          assert(f.histogram.sum == MediaSynth.VideoFrames * 3L * w * h)
      }
      assert(f.brightness >= 0.0 && f.brightness <= 1.0)
    }
  }

  test("kind profile aggregates all three modalities") {
    val prof = MediaPipeline.kindProfile(TestSpark.spark, TestSpark.Sf).collect()
    assert(prof.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(prof.map(_.getLong(1)).sum == 500)
  }

  test("resize re-encodes raster payloads at the target dims; audio untouched") {
    val spark = TestSpark.spark
    val media = MediaPipeline.mediaTable(spark, TestSpark.Sf)
    val resized = MediaPipeline.resize(media, 8, 8).collect()
    assert(resized.length == 500)
    resized.foreach { r =>
      r.kind match {
        case "audio" =>
          assert(r.bytes.toSeq == MediaSynth.wavFor(r.media_id).toSeq)
        case "image" =>
          assert(r.width == 8 && r.height == 8)
          val dec = BmpCodec.decode(r.bytes)
          assert(dec.w == 8 && dec.h == 8)
        case "video" =>
          val frames = BmpCodec.decodeFrames(r.bytes)
          assert(frames.length == MediaSynth.VideoFrames)
          frames.foreach(fr => assert(fr.w == 8 && fr.h == 8))
      }
    }
  }

  test("frame sampling decodes every k-th frame of video payloads") {
    val spark = TestSpark.spark
    val media = MediaPipeline.mediaTable(spark, TestSpark.Sf)
    val nVideo = media.filter(_.kind == "video").count()
    val sampled = MediaPipeline.sampleFrames(media, everyK = 2).collect()
    assert(sampled.length == nVideo)
    sampled.foreach { f =>
      assert(f.kind == "video")
      val (w, h) = (MediaSynth.imgW(f.media_id), MediaSynth.imgH(f.media_id))
      // frames 0 and 2 kept out of 3
      assert(f.histogram.sum == 2 * 3L * w * h)
      assert(f.n_bytes == 2L * BmpCodec.encodedSize(w, h))
    }
  }

  test("aHash is exactly brightness-shift invariant and discriminates images") {
    import graft.multimodal.MediaPipeline.aHash
    // bits are mean-RELATIVE (lum·64 > Σlum), so a uniform +k channel
    // shift (no clipping: values 0..100, k=50) moves every lum by the
    // same amount and leaves every bit unchanged — exactly.
    val rgb = Array.tabulate(16 * 16 * 3)(i => ((i * 37) % 101).toByte)
    val (hi1, lo1, t1) = aHash(BmpCodec.Decoded(16, 16, rgb))
    val (hi2, lo2, t2) = aHash(BmpCodec.Decoded(16, 16, rgb.map(b => (b + 50).toByte)))
    assert((hi1, lo1) == (hi2, lo2), "uniform brightness shift changed aHash bits")
    assert(t2 > t1)
    // and unrelated images land on distinct hashes
    val hashes = Seq(0L, 3L, 6L, 9L, 12L).map { d =>
      val (hi, lo, _) = aHash(BmpCodec.decode(MediaSynth.bmpFor(d))); (hi, lo)
    }
    assert(hashes.distinct.size == hashes.size, "aHash collision across images")
  }

  test("binary media payloads round-trip through parquet byte-exactly") {
    // the storage contract the whole tier rests on: encoded media travels
    // as a parquet binary column with its row, bit-for-bit
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media_rt").toString
    val media = MediaPipeline.mediaTable(spark, TestSpark.Sf)
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .as[MediaPipeline.MediaRow].collect()
      .map(r => r.media_id -> r.bytes.toSeq).toMap
    media.collect().foreach { r =>
      assert(back(r.media_id) == r.bytes.toSeq, s"media ${r.media_id}")
    }
    // and the re-read payloads still decode
    val feats = MediaPipeline.extractFeatures(
      spark.read.parquet(dir).as[MediaPipeline.MediaRow]).count()
    assert(feats == 500)
  }

  test("streaming ingestion decodes media with exact batch parity") {
    // continuous-ingestion shape: a document stream maps through the SAME
    // real decode as the batch query; AvailableNow drain, stateless append
    val spark = TestSpark.spark
    import spark.implicits._
    val stream = graft.streaming.StreamOps.docStream(spark, TestSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val dec = BmpCodec.decode(MediaSynth.bmpFor(d))
        val (hi, lo, total) = MediaPipeline.aHash(dec)
        (d, hi, lo, total)
      })
      .toDF("doc_id", "h_hi", "h_lo", "lum_total")
    val got = graft.streaming.StreamOps
      .runAppendToCompletion(stream, "stream_media_decode")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = SparkEntry.queries("multimodal_phash")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, "streaming decode diverged from the batch query")
  }

  test("multimodal_decode query agrees with an independent feature fold") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("multimodal_decode")(spark, TestSpark.Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.take(5).foreach { r =>
      val d = r.getLong(0)
      val (w, h) = (MediaSynth.imgW(d), MediaSynth.imgH(d))
      var sr = 0L
      for (y <- 0 until h; x <- 0 until w) sr += MediaSynth.red(d, 0L, x, y)
      assert(r.getLong(1) == w.toLong && r.getLong(2) == h.toLong)
      assert(r.getLong(3) == sr)
    }
  }

  test("multimodal_video_cuts: codec-path SADs equal the synthetic formula replay") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("multimodal_video_cuts")(spark, TestSpark.Sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.exists(_._3) && rows.values.exists(!_._3),
      "the threshold must split transitions, not saturate")
    // formula replay (no codec) for every asset's transitions
    rows.keys.map(_._1).toSeq.distinct.sorted.take(10).foreach { d =>
      val w = 1 + d % 16; val h = 1 + (d * 3) % 16
      (0L to 1L).foreach { f =>
        def lum(fr: Long, i: Long): Long =
          2 * ((d * 31 + fr * 71 + (i % w) * 7 + (i / w) * 13) % 256) +
            5 * ((d * 17 + fr * 43 + (i % w) * 11 + (i / w) * 5) % 256) +
            ((d * 29 + fr * 97 + (i % w) * 3 + (i / w) * 19) % 256)
        val sad = (0L until w * h).map(i => math.abs(lum(f, i) - lum(f + 1, i))).sum
        val (nPx, gotSad, isCut) = rows((d, f))
        assert(nPx == w * h && gotSad == sad, s"asset $d f=$f SAD")
        assert(isCut == (sad > 680L * w * h), s"asset $d f=$f flag")
      }
    }
  }
}
