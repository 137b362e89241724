package graft.multimodal

/** Pure-JVM media HEADER codec: sniffs the container format from magic
  * bytes and parses real structural metadata (dimensions, sample rate,
  * channel count, frame count) out of JPEG / PNG / GIF / WAV payloads —
  * no external codec library, just byte parsing of the published formats:
  *
  *   - JPEG: marker walk from SOI (FFD8) to the first SOF0/1/2/...
  *     frame header, whose payload carries height/width big-endian
  *     (ITU-T T.81 §B.2.2).
  *   - PNG: 8-byte signature then the IHDR chunk — width/height are the
  *     first two big-endian u32 of its data (RFC 2083 §4.1.1).
  *   - GIF: "GIF87a"/"GIF89a" then logical-screen width/height as
  *     little-endian u16.
  *   - WAV: RIFF/WAVE chunk walk; "fmt " carries channels (LE u16) and
  *     sample rate (LE u32), "data"'s size over the frame stride gives
  *     the frame count (RIFF/WAVE spec).
  *
  * Anything unrecognized or truncated decodes as format "unknown" with
  * null metadata — never an exception (a 100 TB corpus WILL contain
  * corrupt payloads; a decode that throws kills the whole task).
  *
  * Pixel/sample DECODING (entropy-coded scan data, IDAT inflate, PCM)
  * is out of scope in this container and is not faked: the metadata
  * here is really parsed from the bytes.
  */
object MediaCodec {

  /** Parsed media metadata. Image fields null for audio and vice versa;
    * everything null (but sizeBytes) for unrecognized payloads. */
  case class MediaMeta(
      format: String,
      width: Option[Int], height: Option[Int],
      nFrames: Option[Int],
      sampleRate: Option[Int], channels: Option[Int],
      sizeBytes: Long)

  // ---- sniff + dispatch ----

  def decode(payload: Array[Byte]): MediaMeta = {
    val size = payload.length.toLong
    def unknown = MediaMeta("unknown", None, None, None, None, None, size)
    try {
      if (isJpeg(payload)) parseJpeg(payload).getOrElse(unknown)
      else if (isPng(payload)) parsePng(payload).getOrElse(unknown)
      else if (isGif(payload)) parseGif(payload).getOrElse(unknown)
      else if (isWav(payload)) parseWav(payload).getOrElse(unknown)
      else unknown
    } catch { case _: IndexOutOfBoundsException => unknown }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && u8(b, 0) == 0x89 && u8(b, 1) == 'P' && u8(b, 2) == 'N' &&
      u8(b, 3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
      u8(b, 6) == 0x1a && u8(b, 7) == 0x0a
  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  // ---- JPEG: marker walk to the first start-of-frame ----

  /** SOF markers carrying frame dimensions: C0-C3, C5-C7, C9-CB, CD-CF
    * (C4=DHT, C8=JPG, CC=DAC are NOT frame headers). */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf &&
      marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  private def parseJpeg(b: Array[Byte]): Option[MediaMeta] = {
    var i = 2 // past SOI
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return None // desynced — not a marker
      val marker = u8(b, i + 1)
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before SOF
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker, no length
      } else {
        val segLen = be16(b, i + 2) // includes the 2 length bytes
        if (segLen < 2) return None
        if (isSof(marker)) {
          // segment: len(2) precision(1) height(2) width(2) ...
          if (i + 9 > b.length) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return Some(MediaMeta("jpeg", Some(w), Some(h), Some(1), None, None,
            b.length.toLong))
        }
        i += 2 + segLen
      }
    }
    None
  }

  // ---- PNG: IHDR is the mandatory first chunk ----

  private def parsePng(b: Array[Byte]): Option[MediaMeta] = {
    // chunk at 8: length(4) type(4)="IHDR" width(4) height(4) ...
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    Some(MediaMeta("png", Some(w), Some(h), Some(1), None, None, b.length.toLong))
  }

  // ---- GIF: logical screen descriptor ----

  private def parseGif(b: Array[Byte]): Option[MediaMeta] = {
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) return None
    Some(MediaMeta("gif", Some(w), Some(h), Some(1), None, None, b.length.toLong))
  }

  // ---- WAV: RIFF chunk walk for fmt + data ----

  private def parseWav(b: Array[Byte]): Option[MediaMeta] = {
    var i = 12
    var sampleRate, channels, bitsPerSample = -1
    var dataSize = -1L
    while (i + 8 <= b.length && (sampleRate < 0 || dataSize < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        bitsPerSample = le16(b, i + 22)
      } else if (id == "data") {
        dataSize = math.min(size, (b.length - i - 8).toLong)
      }
      // chunks are 2-byte aligned; advance in Long arithmetic — a corrupt
      // 32-bit size (e.g. 0xFFFFFFF7) truncated via toInt would make the
      // step zero/negative and wedge the walk forever. Overshoot clamps to
      // b.length, which terminates the loop.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length.toLong) b.length else next.toInt
    }
    if (sampleRate <= 0 || channels <= 0 || bitsPerSample <= 0) return None
    val blockAlign = channels * (bitsPerSample / 8)
    val frames =
      if (dataSize >= 0 && blockAlign > 0) Some((dataSize / blockAlign).toInt)
      else None
    Some(MediaMeta("wav", None, None, frames, Some(sampleRate), Some(channels),
      b.length.toLong))
  }

  // ---- pixel / sample decoding (REAL, pure JDK) ----
  // javax.imageio ships with the JDK (PNG/GIF lossless, JPEG/BMP too) and
  // java.util.zip provides the PNG inflate — so decoded-pixel features
  // need no external codec library. JPEG decode is LOSSY by nature, so
  // exact-value oracles use PNG (bit-exact per spec) and WAV PCM.

  /** Decoded raster: `argb(y * width + x)` as packed 0xAARRGGBB. */
  case class PixelImage(width: Int, height: Int, argb: Array[Int])

  /** Decode payload pixels via the JDK's ImageIO. None for payloads with
    * no decodable raster (header-only fixtures, corrupt scan data, audio
    * or unknown formats) — callers treat that as "no features", never an
    * error. */
  def decodePixels(payload: Array[Byte]): Option[PixelImage] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        Some(PixelImage(w, h, img.getRGB(0, 0, w, h, null, 0, w)))
      }
    } catch { case _: Exception => None }

  /** Interleaved PCM s16 frames of a WAV payload (all channels). */
  case class PcmAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Decode WAV PCM s16 samples (the fmt+data chunks parseWav already
    * walks; this additionally materializes the sample words). */
  def decodeSamples(payload: Array[Byte]): Option[PcmAudio] =
    try {
      if (!isWav(payload)) return None
      var i = 12
      var sampleRate, channels, bitsPerSample = -1
      var dataOff = -1
      var dataLen = -1
      while (i + 8 <= payload.length && (sampleRate < 0 || dataOff < 0)) {
        val id = new String(payload, i, 4, "US-ASCII")
        val size = le32(payload, i + 4).toLong & 0xffffffffL
        if (id == "fmt " && i + 8 + 16 <= payload.length) {
          channels = le16(payload, i + 10)
          sampleRate = le32(payload, i + 12)
          bitsPerSample = le16(payload, i + 22)
        } else if (id == "data") {
          dataOff = i + 8
          dataLen = math.min(size, (payload.length - i - 8).toLong).toInt
        }
        val next = i.toLong + 8L + size + (size & 1L)
        i = if (next > payload.length.toLong) payload.length else next.toInt
      }
      if (sampleRate <= 0 || channels <= 0 || bitsPerSample != 16 ||
          dataOff < 0) return None
      val n = dataLen / 2
      val out = new Array[Short](n)
      var j = 0
      while (j < n) {
        out(j) = (u8(payload, dataOff + 2 * j) |
          (payload(dataOff + 2 * j + 1).toInt << 8)).toShort
        j += 1
      }
      Some(PcmAudio(sampleRate, channels, out))
    } catch { case _: Exception => None }

  // ---- decoded-pixel features (integer-exact, oracle-mirrorable) ----

  /** Integer luma (ITU-R 601 rational, integer division — exact). */
  def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** RGB histogram: `bins` buckets per channel (bucket = value / (256 /
    * bins)), R buckets then G then B — 3 × bins exact counts. */
  def rgbHistogram(img: PixelImage, bins: Int = 4): Array[Long] = {
    val out = new Array[Long](3 * bins)
    val div = 256 / bins
    var i = 0
    while (i < img.argb.length) {
      val v = img.argb(i)
      out(((v >> 16) & 0xff) / div) += 1
      out(bins + (((v >> 8) & 0xff) / div)) += 1
      out(2 * bins + ((v & 0xff) / div)) += 1
      i += 1
    }
    out
  }

  /** 64-bit average hash: 8×8 block-mean luma grid (integer division at
    * both levels), bit y*8+x set iff the block's mean luma exceeds the
    * grid mean. Returned as 16 lowercase hex chars (byte y = bits of row
    * y) — a string, so bit 63 needs no sign gymnastics in oracles. */
  def averageHashHex(img: PixelImage): String = {
    val block = new Array[Long](64)
    val count = new Array[Long](64)
    var y = 0
    while (y < img.height) {
      val by = math.min(7, y * 8 / img.height)
      var x = 0
      while (x < img.width) {
        val bx = math.min(7, x * 8 / img.width)
        block(by * 8 + bx) += luma(img.argb(y * img.width + x))
        count(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < 64) { if (count(i) > 0) block(i) /= count(i); i += 1 }
    val mean = block.sum / 64
    val sb = new StringBuilder(16)
    var b = 0
    while (b < 8) {
      var byte = 0
      var x = 0
      while (x < 8) {
        if (block(b * 8 + x) > mean) byte |= (1 << x)
        x += 1
      }
      sb.append(f"$byte%02x")
      b += 1
    }
    sb.toString
  }

  /** Audio features over channel-0 frames, all integer-exact:
    * (peak |sample|, sign-flip count between consecutive frames,
    * channel-0 energy Σ s²). */
  def audioFeatures(a: PcmAudio): (Long, Long, Long) = {
    val n = a.samples.length / a.channels
    var peak = 0L
    var crossings = 0L
    var energy = 0L
    var prev = 0
    var j = 0
    while (j < n) {
      val s = a.samples(j * a.channels).toInt
      peak = math.max(peak, math.abs(s.toLong))
      energy += s.toLong * s
      if (j > 0 && ((s < 0) != (prev < 0))) crossings += 1
      prev = s
      j += 1
    }
    (peak, crossings, energy)
  }

  // ---- synthetic header-valid payloads ----
  // Used by fixtures and the oracled decode query: the payload is a REAL
  // container header (this codec and any other header parser recover the
  // same values) around inert filler, so decode(synthetic(x)) is exactly
  // invertible and an external oracle can verify the round trip from the
  // generating arithmetic alone.

  /** SOI + COM(filler) + SOF0 + EOI: 27 + pad bytes. */
  def syntheticJpeg(width: Int, height: Int, pad: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(27 + pad)
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xfe) // COM
    val comLen = 2 + pad
    out.write(comLen >> 8); out.write(comLen & 0xff)
    (0 until pad).foreach(j => out.write(j & 0x7f))
    out.write(0xff); out.write(0xc0) // SOF0, 3 components
    out.write(0); out.write(17) // length = 8 + 3*3
    out.write(8) // precision
    out.write(height >> 8); out.write(height & 0xff)
    out.write(width >> 8); out.write(width & 0xff)
    out.write(3) // n components
    (1 to 3).foreach { c => out.write(c); out.write(0x11); out.write(0) }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** signature + IHDR + filler chunk + IEND: 57 + pad bytes (chunk CRCs
    * are zeroed — valid for structural parsing, which never inflates). */
  def syntheticPng(width: Int, height: Int, pad: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(57 + pad)
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      typ.foreach(c => out.write(c.toInt))
      out.write(data, 0, data.length)
      (0 until 4).foreach(_ => out.write(0)) // CRC zeroed
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >> 16).toByte
    ihdr(2) = (width >> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >> 16).toByte
    ihdr(6) = (height >> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8; ihdr(9) = 2 // bit depth, truecolor
    chunk("IHDR", ihdr)
    chunk("IDAT", Array.tabulate[Byte](pad)(j => (j & 0x7f).toByte))
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** RIFF/WAVE + fmt(16, PCM s16) + data(nSamples frames of silence):
    * 44 + nSamples*channels*2 bytes. */
  def syntheticWav(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * channels * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataBytes)
    def ascii(s: String): Unit = s.foreach(c => out.write(c.toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    ascii("RIFF"); w32(36 + dataBytes); ascii("WAVE")
    ascii("fmt "); w32(16)
    w16(1) // PCM
    w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 2) // byte rate
    w16(channels * 2) // block align
    w16(16) // bits per sample
    ascii("data"); w32(dataBytes)
    (0 until dataBytes).foreach(_ => out.write(0))
    out.toByteArray
  }

  /** A fully VALID truecolor PNG (real zlib stream, real CRC32s) whose
    * raster is a two-tone vertical split: columns < width/2 are colorA,
    * the rest colorB (packed 0xRRGGBB). Any PNG decoder recovers the
    * exact pixels (PNG is lossless), so decoded-pixel features are
    * oracle-mirrorable from (width, height, colorA, colorB) alone. */
  def syntheticPngReal(width: Int, height: Int,
      colorA: Int, colorB: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(len >>> 24); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      val crc = new java.util.zip.CRC32
      val typB = typ.getBytes("US-ASCII")
      crc.update(typB)
      crc.update(data)
      out.write(typB, 0, 4)
      out.write(data, 0, data.length)
      val c = crc.getValue
      out.write((c >>> 24).toInt & 0xff); out.write((c >> 16).toInt & 0xff)
      out.write((c >> 8).toInt & 0xff); out.write(c.toInt & 0xff)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >> 16).toByte
    ihdr(2) = (width >> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >> 16).toByte
    ihdr(6) = (height >> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor RGB
    chunk("IHDR", ihdr)
    // raw scanlines: filter byte 0 + RGB triples
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      val base = y * (1 + width * 3)
      raw(base) = 0 // filter: None
      var x = 0
      while (x < width) {
        val c = if (x < width / 2) colorA else colorB
        raw(base + 1 + 3 * x) = ((c >> 16) & 0xff).toByte
        raw(base + 1 + 3 * x + 1) = ((c >> 8) & 0xff).toByte
        raw(base + 1 + 3 * x + 2) = (c & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** A WAV whose channel frames carry a ±amp square wave with
    * `halfPeriod` frames per half-cycle (all channels identical):
    * frame j = +amp when (j / halfPeriod) is even, else -amp. Peak,
    * crossing count and energy follow from the arithmetic exactly. */
  def syntheticWavWave(sampleRate: Int, channels: Int, nFrames: Int,
      amp: Int, halfPeriod: Int): Array[Byte] = {
    val dataBytes = nFrames * channels * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataBytes)
    def ascii(s: String): Unit = s.foreach(c => out.write(c.toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    ascii("RIFF"); w32(36 + dataBytes); ascii("WAVE")
    ascii("fmt "); w32(16)
    w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 2); w16(channels * 2); w16(16)
    ascii("data"); w32(dataBytes)
    var j = 0
    while (j < nFrames) {
      val s = if ((j / halfPeriod) % 2 == 0) amp else -amp
      var c = 0
      while (c < channels) { w16(s & 0xffff); c += 1 }
      j += 1
    }
    out.toByteArray
  }

  /** Deterministic synthetic payload for doc `id` — the arithmetic an
    * external oracle mirrors (format by id%3; dims/rates below). */
  def syntheticForDoc(id: Long): Array[Byte] = (id % 3) match {
    case 0 => syntheticJpeg(docWidth(id), docHeight(id), docPad(id))
    case 1 => syntheticPng(docWidth(id), docHeight(id), docPad(id))
    case _ => syntheticWav(docRate(id), docChannels(id), docSamples(id))
  }

  def docWidth(id: Long): Int = 64 + ((id * 7) % 1024).toInt
  def docHeight(id: Long): Int = 64 + ((id * 13) % 1024).toInt
  def docPad(id: Long): Int = (id % 50).toInt
  def docRate(id: Long): Int = 8000 + ((id % 8) * 1000).toInt
  def docChannels(id: Long): Int = 1 + (id % 2).toInt
  def docSamples(id: Long): Int = 100 + (id % 400).toInt

  /** Deterministic PIXEL-LEVEL payload for doc `id` (the features-query
    * fixture): even ids → a real two-tone PNG, odd ids → a square-wave
    * WAV. Dims are multiples of 8 with the tone split on the 8×8 grid
    * boundary, so the average-hash blocks are uniform and the whole
    * feature set follows from this arithmetic exactly. */
  def syntheticFeatureDoc(id: Long): Array[Byte] =
    if (id % 2 == 0)
      syntheticPngReal(featWidth(id), featHeight(id),
        featColorA(id), featColorB(id))
    else
      syntheticWavWave(docRate(id), docChannels(id), featFrames(id),
        featAmp(id), featHalfPeriod(id))

  def featWidth(id: Long): Int = 8 * (8 + ((id * 7) % 57)).toInt // 64..512
  def featHeight(id: Long): Int = 8 * (8 + ((id * 13) % 57)).toInt
  def featColorA(id: Long): Int =
    (((id * 17) % 256) << 16).toInt | (((id * 29) % 256) << 8).toInt |
      ((id * 31) % 256).toInt
  def featColorB(id: Long): Int =
    (((id * 37) % 256) << 16).toInt | (((id * 41) % 256) << 8).toInt |
      ((id * 43) % 256).toInt
  def featAmp(id: Long): Int = 500 + (id % 3000).toInt
  def featHalfPeriod(id: Long): Int = 1 + (id % 20).toInt
  def featFrames(id: Long): Int = 200 + (id % 300).toInt
}
