package graft.multimodal

/** Real pure-JVM media codecs for the multimodal column tier: Windows
  * bitmap (BMP, 24-bpp uncompressed — the format every imaging stack can
  * emit without a codec library) and RIFF/WAVE PCM16 mono audio. Both are
  * byte-level container formats with published layouts, so header parse,
  * stride/padding, row order, and chunk walking are all REAL decode work —
  * no image/audio libraries exist in this environment, and none are
  * needed for these two formats.
  *
  * Every reader validates what it consumes and throws on malformed input
  * (truncated header, unsupported bpp, compressed payload) rather than
  * guessing — at 100 TB a silent mis-parse poisons downstream features,
  * while a loud per-row failure routes to the quarantine path
  * (inv_error_status semantics).
  */
object BmpCodec {

  val FileHeaderSize = 14
  val InfoHeaderSize = 40
  val PixelDataOffset: Int = FileHeaderSize + InfoHeaderSize

  /** row stride in bytes: 24-bpp rows pad to a 4-byte boundary */
  def stride(w: Int): Int = (w * 3 + 3) & ~3

  def encodedSize(w: Int, h: Int): Int = PixelDataOffset + stride(w) * h

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private[multimodal] def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private[multimodal] def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Encode a top-down row-major RGB raster (3 bytes per pixel, r g b) as
    * a standard bottom-up 24-bpp BI_RGB bitmap. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(rgb.length == w * h * 3, s"raster ${rgb.length} != ${w * h * 3}")
    val st = stride(w)
    val out = new Array[Byte](encodedSize(w, h))
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length)
    putU32(out, 10, PixelDataOffset)
    putU32(out, 14, InfoHeaderSize)
    putU32(out, 18, w)
    putU32(out, 22, h) // positive height: bottom-up pixel rows
    putU16(out, 26, 1) // planes
    putU16(out, 28, 24) // bits per pixel
    putU32(out, 34, st * h) // image size (BI_RGB: may be 0, we write it)
    putU32(out, 38, 2835) // 72 dpi in pixels/metre
    putU32(out, 42, 2835)
    var y = 0
    while (y < h) {
      val rowOff = PixelDataOffset + (h - 1 - y) * st // bottom-up
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        out(rowOff + x * 3) = rgb(p + 2) // B
        out(rowOff + x * 3 + 1) = rgb(p + 1) // G
        out(rowOff + x * 3 + 2) = rgb(p) // R
        x += 1
      }
      y += 1
    }
    out
  }

  final case class Decoded(w: Int, h: Int, rgb: Array[Byte])

  /** the file size the header at `off` declares (frame walking in
    * concatenated-BMP streams) */
  def declaredSize(bytes: Array[Byte], off: Int): Int = {
    require(off + FileHeaderSize <= bytes.length, s"truncated BMP header at $off")
    require(bytes(off) == 'B' && bytes(off + 1) == 'M', s"bad BMP magic at $off")
    u32(bytes, off + 2)
  }

  /** Parse one 24-bpp uncompressed BMP starting at `off`: validates magic,
    * header sizes, planes/bpp/compression, honours the header's pixel-data
    * offset and the padded stride, and un-mirrors the bottom-up row order.
    * Returns the raster in top-down row-major RGB. */
  def decodeAt(bytes: Array[Byte], off: Int): Decoded = {
    val size = declaredSize(bytes, off)
    require(off + size <= bytes.length, s"declared size $size overruns buffer")
    val dataOff = u32(bytes, off + 10)
    val infoSize = u32(bytes, off + 14)
    require(infoSize >= InfoHeaderSize, s"unsupported info header $infoSize")
    val w = u32(bytes, off + 18)
    val h = u32(bytes, off + 22)
    require(w > 0 && h > 0, s"unsupported dimensions ${w}x$h (top-down h<0 not supported)")
    require(u16(bytes, off + 26) == 1, "planes != 1")
    val bpp = u16(bytes, off + 28)
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bpp BI_RGB)")
    require(u32(bytes, off + 30) == 0, "compressed BMP not supported")
    val st = stride(w)
    require(off + dataOff + st * h <= bytes.length, "pixel data truncated")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val rowOff = off + dataOff + (h - 1 - y) * st
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        rgb(p) = bytes(rowOff + x * 3 + 2) // R
        rgb(p + 1) = bytes(rowOff + x * 3 + 1) // G
        rgb(p + 2) = bytes(rowOff + x * 3) // B
        x += 1
      }
      y += 1
    }
    Decoded(w, h, rgb)
  }

  def decode(bytes: Array[Byte]): Decoded = decodeAt(bytes, 0)

  /** Walk a stream of concatenated BMP frames (the engine's trivial video
    * container): each frame's extent is its OWN declared file size, so the
    * walk is a real parse, not fixed-width slicing. */
  def decodeFrames(bytes: Array[Byte]): Vector[Decoded] = {
    val out = Vector.newBuilder[Decoded]
    var off = 0
    while (off < bytes.length) {
      val size = declaredSize(bytes, off)
      require(size > 0, s"zero-length frame at $off")
      out += decodeAt(bytes, off)
      off += size
    }
    out.result()
  }

  /** nearest-neighbour rescale of a decoded raster (the real resize the
    * round-5 stub stood in for) */
  def resample(d: Decoded, w2: Int, h2: Int): Decoded = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    val rgb = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * d.h / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * d.w / w2).toInt
        val s = (sy * d.w + sx) * 3
        val t = (y * w2 + x) * 3
        rgb(t) = d.rgb(s); rgb(t + 1) = d.rgb(s + 1); rgb(t + 2) = d.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Decoded(w2, h2, rgb)
  }
}

/** RIFF/WAVE PCM16 mono: canonical 44-byte header + 16-bit little-endian
  * samples. The reader walks RIFF chunks generically (fmt before data, but
  * unknown chunks are skipped by their declared size), so files with extra
  * LIST/INFO chunks still parse. */
object WavCodec {

  final case class Decoded(sampleRate: Int, samples: Array[Short])

  def encodedSize(n: Int): Int = 44 + n * 2

  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putU32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte; out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def putU16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    def putTag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
    putTag(0, "RIFF"); putU32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putU32(16, 16)
    putU16(20, 1) // PCM
    putU16(22, 1) // mono
    putU32(24, sampleRate)
    putU32(28, sampleRate * 2) // byte rate
    putU16(32, 2) // block align
    putU16(34, 16) // bits per sample
    putTag(36, "data"); putU32(40, dataSize)
    var i = 0
    while (i < samples.length) {
      out(44 + i * 2) = (samples(i) & 0xff).toByte
      out(44 + i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def decode(bytes: Array[Byte]): Decoded = {
    import BmpCodec.{u16, u32}
    require(bytes.length >= 12, "truncated RIFF header")
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = tag(off)
      val size = u32(bytes, off + 4)
      require(off + 8 + size <= bytes.length, s"chunk $id truncated")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          require(u16(bytes, off + 8) == 1, "only PCM (format 1) supported")
          require(u16(bytes, off + 10) == 1, "only mono supported")
          sampleRate = u32(bytes, off + 12)
          require(u16(bytes, off + 22) == 16, "only 16-bit samples supported")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          require(size % 2 == 0, "odd PCM16 data size")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = ((bytes(off + 8 + i * 2) & 0xff) |
              (bytes(off + 9 + i * 2) << 8)).toShort
            i += 1
          }
        case _ => () // skip unknown chunk by declared size
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even offsets
    }
    require(samples != null, "no data chunk")
    Decoded(sampleRate, samples)
  }
}

/** Deterministic synthetic media assets: closed-form pixel/sample
  * functions of (doc_id, frame, position), so the DuckDB oracle can state
  * what a CORRECT decode must recover without parsing a single byte —
  * any header, stride, row-order, or chunk-walk bug in the codecs breaks
  * the position-weighted checksums. All arithmetic is Long and
  * non-negative before the final shift, matching DuckDB BIGINT exactly. */
object MediaSynth {

  def imgW(d: Long): Int = (1 + d % 16).toInt
  def imgH(d: Long): Int = (1 + (d * 3) % 16).toInt

  def red(d: Long, f: Long, x: Int, y: Int): Int =
    ((d * 31 + f * 71 + x * 7 + y * 13) % 256).toInt
  def green(d: Long, f: Long, x: Int, y: Int): Int =
    ((d * 17 + f * 43 + x * 11 + y * 5) % 256).toInt
  def blue(d: Long, f: Long, x: Int, y: Int): Int =
    ((d * 29 + f * 97 + x * 3 + y * 19) % 256).toInt

  /** one w×h raster for (doc, frame), top-down RGB */
  def raster(d: Long, f: Long, w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        rgb(p) = red(d, f, x, y).toByte
        rgb(p + 1) = green(d, f, x, y).toByte
        rgb(p + 2) = blue(d, f, x, y).toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  def bmpFor(d: Long, f: Long = 0L): Array[Byte] =
    BmpCodec.encode(imgW(d), imgH(d), raster(d, f, imgW(d), imgH(d)))

  /** video = VideoFrames concatenated BMP frames, frame index shifting the
    * pixel function */
  val VideoFrames = 3
  def videoFor(d: Long): Array[Byte] =
    (0 until VideoFrames).map(f => bmpFor(d, f.toLong)).reduce(_ ++ _)

  def wavN(d: Long): Int = (64 + d % 129).toInt
  def wavRate(d: Long): Int = (8000 + (d % 4) * 4000).toInt
  def sample(d: Long, i: Int): Short =
    ((d * 7919 + i.toLong * 104729) % 65536 - 32768).toShort
  def wavFor(d: Long): Array[Byte] =
    WavCodec.encode(wavRate(d), Array.tabulate(wavN(d))(i => sample(d, i)))
}
