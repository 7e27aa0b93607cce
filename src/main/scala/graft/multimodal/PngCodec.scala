package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG PIXEL codec (ISO/IEC 15948) for non-interlaced 8-bit
  * grayscale (color type 0) and truecolor RGB (color type 2) — the
  * container format whose compression (zlib DEFLATE, RFC 1950/1951)
  * and per-scanline filtering (§9: None/Sub/Up/Average/Paeth) ship in
  * the JDK, so REAL pixel decode needs no external library. This
  * closes the pixel gap for PNG; JPEG and GIF pixel decode genuinely
  * need an entropy-codec library and remain the declared stub
  * (SURVEY.md §6).
  *
  * The decoder returns per-sample aggregate statistics rather than the
  * pixel buffer: a 100 TB metadata/quality pass wants per-image stats
  * (mean/variance of luma, histogram moments), not a shuffle of raw
  * rasters — and the aggregates are exactly what the driver's
  * arithmetic oracle can recompute independently.
  *
  * Reference container behavior: bdi-kit has no multimodal surface;
  * this backs graft's own multimodal column suite (SURVEY.md §G).
  */
object PngCodec {

  /** Decoded-pixel aggregates: sample count and the exact integer
    * sum / sum-of-squares over every channel sample (gray: 1 sample
    * per pixel; RGB: 3). Integer sums make the cross-engine parity
    * exact — no float accumulation order anywhere.
    */
  final case class PixelStats(width: Int, height: Int, channels: Int,
                              nSamples: Long, sumVal: Long, sumSq: Long)

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Chunk walk + zlib inflate to the FILTERED scanline buffer
    * (height rows of 1 filter byte + width*channels samples), shared
    * by the streaming-stats and raster decodes. None for anything
    * unsupported or malformed — every guard documented on
    * [[decodeStats]] lives here.
    */
  private def inflateFiltered(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < Sig.length + 12) return None
    var i = 0
    while (i < Sig.length) { if (bytes(i) != Sig(i)) return None; i += 1 }

    var width, height, channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var pos = Sig.length
    var sawEnd = false
    while (!sawEnd) {
      if (pos + 8 > bytes.length) return None
      val len = be32(bytes, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          val w = be32(bytes, dataOff)
          val h = be32(bytes, dataOff + 4)
          val bitDepth = bytes(dataOff + 8) & 0xff
          val colorType = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
          if (bitDepth != 8 || interlace != 0) return None
          channels = colorType match {
            case 0 => 1 // grayscale
            case 2 => 3 // truecolor RGB
            case _ => return None // palette/alpha need more machinery
          }
          width = w.toInt; height = h.toInt
        case "IDAT" => idat.write(bytes, dataOff, len.toInt)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunks are skippable by definition
      }
      pos += 12 + len.toInt
    }
    if (width < 0 || idat.size == 0) return None

    // guard absurd dimension/payload combinations BEFORE allocating
    val stride = width.toLong * channels
    val rawLen = height.toLong * (1 + stride)
    if (rawLen > 256L * 1024 * 1024) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // with output space available, a zero-byte round means the
        // inflater CANNOT progress — truncated input, or a preset-
        // dictionary (FDICT) stream we will never feed; treating only
        // needsInput() as terminal left FDICT spinning forever (an
        // adversarial blob could hang an executor task permanently)
        if (n == 0 && !inf.finished()) return None
        got += n
      }
      if (got < raw.length) return None
      // the stream must END here: an IDAT that inflates to MORE than
      // height * (1 + stride) bytes is malformed (the doc contract
      // promises None, not plausible stats over a prefix). One extra
      // probe byte both detects surplus data and lets the inflater
      // consume the zlib trailer so finished() is authoritative.
      val probe = new Array[Byte](1)
      if (inf.inflate(probe, 0, 1) > 0 || !inf.finished()) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    Some((width, height, channels, raw))
  }

  /** Decode a PNG's pixels to [[PixelStats]], or None for anything
    * unsupported (bit depth != 8, palette/alpha color types,
    * interlaced) or malformed (bad signature/chunk layout, truncated
    * or over-long inflate, unknown filter byte) — callers map None to
    * an explicit null-stats row, never an exception (garbage-safe,
    * like [[ImageHeaders.decode]]).
    */
  def decodeStats(bytes: Array[Byte]): Option[PixelStats] = {
    val (width, height, channels, raw) = inflateFiltered(bytes) match {
      case Some(t) => t
      case None => return None
    }
    // reverse the per-scanline filters, accumulating exact integer
    // sums as each byte reconstructs (no second pass, no pixel buffer
    // beyond the current and previous rows)
    val stride = width.toLong * channels
    val bpp = channels
    val w = stride.toInt
    var prev = new Array[Int](w)
    var cur = new Array[Int](w)
    var sum = 0L
    var sumSq = 0L
    var off = 0
    var y = 0
    while (y < height) {
      val ft = raw(off) & 0xff; off += 1
      if (ft > 4) return None
      var x = 0
      while (x < w) {
        val f = raw(off + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= bpp && y > 0) prev(x - bpp) else 0
        val v = ft match {
          case 0 => f
          case 1 => (f + a) & 0xff
          case 2 => (f + b) & 0xff
          case 3 => (f + ((a + b) >> 1)) & 0xff
          case 4 => (f + paeth(a, b, c)) & 0xff
        }
        cur(x) = v
        sum += v
        sumSq += v.toLong * v
        x += 1
      }
      off += w
      val t = prev; prev = cur; cur = t
      y += 1
    }
    Some(PixelStats(width, height, channels, stride * height, sum, sumSq))
  }

  /** A decoded raster: flat row-major unsigned samples (mask 0xff on
    * read). Only materialized by [[decodePixels]]/[[resizeStats]] —
    * the stats path above stays two-scanline streaming by design.
    */
  final case class Pixels(width: Int, height: Int, channels: Int,
                          data: Array[Byte]) {
    def sample(x: Int, y: Int, c: Int): Int =
      data((y.toLong * width * channels + x.toLong * channels + c).toInt) & 0xff
  }

  /** Decode the full pixel raster (same support envelope and
    * garbage-safety as [[decodeStats]]). The raster is bounded by the
    * shared 256 MiB inflate guard — transform-layer callers
    * (resize, feature extraction) get real samples to work on.
    */
  def decodePixels(bytes: Array[Byte]): Option[Pixels] = {
    val (width, height, channels, raw) = inflateFiltered(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val bpp = channels
    val w = width * channels
    val out = new Array[Byte](w * height)
    var off = 0
    var y = 0
    while (y < height) {
      val ft = raw(off) & 0xff; off += 1
      if (ft > 4) return None
      val rowBase = y * w
      var x = 0
      while (x < w) {
        val f = raw(off + x) & 0xff
        val a = if (x >= bpp) out(rowBase + x - bpp) & 0xff else 0
        val b = if (y > 0) out(rowBase - w + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(rowBase - w + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => (f + a) & 0xff
          case 2 => (f + b) & 0xff
          case 3 => (f + ((a + b) >> 1)) & 0xff
          case 4 => (f + paeth(a, b, c)) & 0xff
        }
        out(rowBase + x) = v.toByte
        x += 1
      }
      off += w
      y += 1
    }
    Some(Pixels(width, height, channels, out))
  }

  /** REAL nearest-neighbor resize on the decoded raster (PIL NEAREST
    * semantics: source index floor(target * src / dst) — exact integer
    * arithmetic, works for down- and up-sampling), reduced to the
    * exact integer aggregates of the RESIZED image. The thumbnail
    * pass a multimodal curation pipeline runs at scale: decode,
    * resize, emit stats — never shuffle a raster.
    */
  def resizeStats(bytes: Array[Byte], tw: Int, th: Int): Option[PixelStats] = {
    require(tw > 0 && th > 0, "positive target dimensions")
    decodePixels(bytes).map { px =>
      var sum = 0L
      var sumSq = 0L
      var y = 0
      while (y < th) {
        val sy = (y.toLong * px.height / th).toInt
        var x = 0
        while (x < tw) {
          val sx = (x.toLong * px.width / tw).toInt
          var c = 0
          while (c < px.channels) {
            val v = px.sample(sx, sy, c)
            sum += v
            sumSq += v.toLong * v
            c += 1
          }
          x += 1
        }
        y += 1
      }
      PixelStats(tw, th, px.channels, tw.toLong * th * px.channels, sum, sumSq)
    }
  }

  /** Encode real PNG bytes (signature + IHDR + one zlib IDAT + IEND,
    * genuine CRCs) for 8-bit gray (channels = 1) or RGB (channels = 3)
    * with sample s of the flat row-major buffer valued `value(s)`.
    * The filter type cycles y % 5, so a round-trip through
    * [[decodeStats]] exercises EVERY unfilter (None/Sub/Up/Average/
    * Paeth) — filtering is a lossless transform, so the decoded sums
    * must equal the generator's closed form regardless.
    */
  def encode(width: Int, height: Int, channels: Int, value: Long => Int): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    require(channels == 1 || channels == 3, "gray or RGB")
    val bpp = channels
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var off = 0
    for (y <- 0 until height) {
      var x = 0
      while (x < stride) { cur(x) = value(y.toLong * stride + x) & 0xff; x += 1 }
      val ft = y % 5
      raw(off) = ft.toByte; off += 1
      x = 0
      while (x < stride) {
        val a = if (x >= bpp) cur(x - bpp) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= bpp && y > 0) prev(x - bpp) else 0
        val f = ft match {
          case 0 => cur(x)
          case 1 => cur(x) - a
          case 2 => cur(x) - b
          case 3 => cur(x) - ((a + b) >> 1)
          case 4 => cur(x) - paeth(a, b, c)
        }
        raw(off) = (f & 0xff).toByte; off += 1
        x += 1
      }
      Array.copy(cur, 0, prev, 0, stride)
    }

    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) { val n = defl.deflate(tmp); zout.write(tmp, 0, n) }
    defl.end()

    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      w32(data.length.toLong)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      w32(crc.getValue)
      out.toByteArray
    }
    val ihdr = new Array[Byte](13)
    def put32(arr: Array[Byte], i: Int, v: Int): Unit = {
      arr(i) = ((v >> 24) & 0xff).toByte; arr(i + 1) = ((v >> 16) & 0xff).toByte
      arr(i + 2) = ((v >> 8) & 0xff).toByte; arr(i + 3) = (v & 0xff).toByte
    }
    put32(ihdr, 0, width); put32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 1) 0 else 2).toByte // color type
    // compression 0, filter 0, interlace 0 already zeroed
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zout.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }
}
