package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG PIXEL codec (ISO/IEC 15948) for the FULL legal
  * color-type × depth matrix — grayscale (0), truecolor RGB (2),
  * palette (3, PLTE indirection, r16), gray+alpha (4, r16), RGBA (6,
  * r16) at 8-bit; 16-bit for the non-palette types (byte-pair
  * big-endian, unfiltered at the true bytes-per-pixel, exact 16-bit
  * integer aggregates on the stats path, high-byte downsample on the
  * 8-bit raster path); and packed sub-byte depths 1/2/4 for gray and
  * palette (MSB-first unpacking, row-tail pad bits ignored, filters
  * over the packed bytes at bpp 1 — all r16), progressive OR
  * Adam7-interlaced (r15 — §8.2's seven filtered sub-images) — the
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

  /** Adam7 interlace pass grid (ISO/IEC 15948 §8.2): per pass
    * (xStart, yStart, xStep, yStep). Each pass is an independently
    * FILTERED sub-image; passes whose sub-image is empty contribute
    * zero bytes (not even filter bytes).
    */
  private val Adam7 = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
    (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def passDims(w: Int, h: Int, p: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = p
    (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
  }

  /** The pass list a given image decodes through: the 7 Adam7
    * sub-images when interlaced, else one full-frame pass.
    */
  private def passes(w: Int, h: Int,
                     interlaced: Boolean): Array[(Int, Int, Int, Int)] =
    if (interlaced) Adam7 else Array((0, 0, 1, 1))

  /** Unfilter one pass's scanlines in place over `raw` starting at
    * `off0` (`rows` rows of 1 filter byte + `rowBytes` samples),
    * emitting each reconstructed sample as (rowIdx, byteIdx, value) —
    * pass-local coordinates; the caller maps them to the frame. Only
    * two scanlines of state. Returns the offset after the pass, or
    * -1 on an unknown filter type.
    */
  private def unfilterPass(raw: Array[Byte], off0: Int, rowBytes: Int,
                           rows: Int, bpp: Int)
                          (emit: (Int, Int, Int) => Unit): Int = {
    if (rowBytes == 0 || rows == 0) return off0
    var prev = new Array[Int](rowBytes)
    var cur = new Array[Int](rowBytes)
    var off = off0
    var y = 0
    while (y < rows) {
      val ft = raw(off) & 0xff; off += 1
      if (ft > 4) return -1
      var x = 0
      while (x < rowBytes) {
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
        emit(y, x, v)
        x += 1
      }
      off += rowBytes
      val t = prev; prev = cur; cur = t
      y += 1
    }
    off
  }

  /** [[inflateFiltered]]'s result: `rawChannels` is the bytes-per-
    * pixel of the FILTERED stream (1 for palette indices, 2 for
    * gray+alpha, 4 for RGBA); `palette` is the PLTE RGB table (empty
    * unless color type 3).
    */
  private final case class Inflated(width: Int, height: Int,
      rawChannels: Int, colorType: Int, depth: Int, interlaced: Boolean,
      palette: Array[Byte], raw: Array[Byte]) {
    /** filter-offset distance in bytes (§9: at least one byte). */
    def bpp: Int = math.max(1, rawChannels * depth / 8)
    /** packed row bytes for `pw` pixels of this format. */
    def rowBytes(pw: Int): Int = (pw * rawChannels * depth + 7) / 8
  }

  /** Chunk walk + zlib inflate to the FILTERED scanline buffer
    * (for interlace 0: height rows of 1 filter byte + width*channels
    * samples; for Adam7: the 7 passes' sub-image scanlines
    * back-to-back), shared by the streaming-stats and raster decodes.
    * None for anything unsupported or malformed — every guard
    * documented on [[decodeStats]] lives here.
    */
  private def inflateFiltered(bytes: Array[Byte]): Option[Inflated] = {
    if (bytes == null || bytes.length < Sig.length + 12) return None
    var i = 0
    while (i < Sig.length) { if (bytes(i) != Sig(i)) return None; i += 1 }

    var width, height, channels, colorType = -1
    var depth = 8
    var interlaced = false
    var palette: Array[Byte] = Array.emptyByteArray
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
          colorType = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
          if (interlace > 1) return None
          val depthOkFor = colorType match {
            // §11.2.2: sub-byte depths only for gray + palette; 16-bit
            // for everything except palette
            case 0 => Seq(1, 2, 4, 8, 16)
            case 3 => Seq(1, 2, 4, 8)
            case _ => Seq(8, 16)
          }
          if (!depthOkFor.contains(bitDepth)) return None
          depth = bitDepth
          interlaced = interlace == 1
          channels = colorType match {
            case 0 => 1 // grayscale
            case 2 => 3 // truecolor RGB
            case 3 => 1 // palette: 1 index byte per pixel (PLTE maps it)
            case 4 => 2 // gray + alpha
            case 6 => 4 // RGBA
            case _ => return None // sub-byte depths stay out of scope
          }
          width = w.toInt; height = h.toInt
        case "PLTE" =>
          // §11.2.3: 1..256 RGB triples; malformed length is fatal
          if (len == 0 || len % 3 != 0 || len > 256 * 3) return None
          palette = java.util.Arrays.copyOfRange(bytes, dataOff,
            dataOff + len.toInt)
        case "IDAT" => idat.write(bytes, dataOff, len.toInt)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunks are skippable by definition
      }
      pos += 12 + len.toInt
    }
    if (width < 0 || idat.size == 0) return None
    if (colorType == 3 && palette.isEmpty) return None // PLTE is REQUIRED

    // guard absurd dimension/payload combinations BEFORE allocating.
    // Interlaced payload: each Adam7 pass has its own filter bytes,
    // so the total is Σ passH·(1 + passW·channels) over non-empty
    // passes (slightly larger than the progressive buffer).
    val rawLen = passes(width, height, interlaced).map { p =>
      val (pw, ph) = passDims(width, height, p)
      // a pass that is empty in EITHER dimension emits nothing — not
      // even filter bytes (§8.2: zero-width rows do not exist)
      if (pw == 0 || ph == 0) 0L
      else ph.toLong * (1 + (pw.toLong * channels * depth + 7) / 8)
    }.sum
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
    Some(Inflated(width, height, channels, colorType, depth, interlaced,
      palette, raw))
  }

  /** Decode a PNG's pixels to [[PixelStats]], or None for anything
    * unsupported (bit depth != 8) or malformed (bad signature/chunk
    * layout, missing/malformed PLTE on a palette image, out-of-range
    * palette index, truncated or over-long inflate, unknown filter
    * byte) — callers map None to an explicit null-stats row, never an
    * exception (garbage-safe, like [[ImageHeaders.decode]]).
    * Adam7-interlaced images decode for real (r15): each pass
    * unfilters independently, and since the aggregates are
    * position-free the pass samples accumulate directly — still two
    * scanlines of state, never a raster. Color types (r16): 0 gray,
    * 2 RGB, 3 palette (indices expand through PLTE → stats over the
    * mapped RGB, channels reported as 3), 4 gray+alpha and 6 RGBA
    * (alpha IS a sample channel — the stats contract is "every
    * channel sample", and a quality pass wants alpha coverage too).
    */
  def decodeStats(bytes: Array[Byte]): Option[PixelStats] = {
    val d = inflateFiltered(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val outChannels = if (d.colorType == 3) 3 else d.rawChannels
    val nColors = d.palette.length / 3
    var sum = 0L
    var sumSq = 0L
    var badIndex = false
    var off = 0
    var hi = 0 // pending high byte of a 16-bit sample (depth 16 only)
    // one reconstructed SAMPLE (gray value, palette index, or one
    // channel byte) — palette indirection and the raw-value paths
    // share it across all depths
    def addSample(sv: Int): Unit =
      if (d.colorType == 3) {
        if (sv >= nColors) badIndex = true
        else {
          var c = 0
          while (c < 3) {
            val s = d.palette(sv * 3 + c) & 0xff
            sum += s; sumSq += s.toLong * s; c += 1
          }
        }
      } else { sum += sv; sumSq += sv.toLong * sv }
    for (p <- passes(d.width, d.height, d.interlaced)) {
      val (pw, ph) = passDims(d.width, d.height, p)
      off = unfilterPass(raw = d.raw, off0 = off, rowBytes = d.rowBytes(pw),
        rows = ph, bpp = d.bpp) { (_, x, v) =>
        if (d.depth < 8) {
          // packed sub-byte samples, MSB first; trailing pad bits of
          // the last row byte fall off the `< pw` guard (sub-byte is
          // single-channel by §11.2.2, so samples-per-row == pw)
          val per = 8 / d.depth
          val mask = (1 << d.depth) - 1
          var j = 0
          while (j < per && x * per + j < pw) {
            addSample((v >> (8 - d.depth * (j + 1))) & mask)
            j += 1
          }
        } else if (d.depth == 16) {
          // big-endian sample reassembly: even byte = high, odd = low;
          // stats are over the FULL 0..65535 sample values (exact)
          if (x % 2 == 0) hi = v
          else addSample((hi << 8) | v)
        } else addSample(v)
      }
      if (off < 0 || badIndex) return None
    }
    Some(PixelStats(d.width, d.height, outChannels,
      d.width.toLong * d.height * outChannels, sum, sumSq))
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
    val d = inflateFiltered(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val rc = d.rawChannels
    val outChannels = if (d.colorType == 3) 3 else rc
    val nColors = d.palette.length / 3
    val w = d.width * outChannels
    val out = new Array[Byte](w * d.height)
    var badIndex = false
    var off = 0
    val bpp = d.bpp
    for (p @ (x0, y0, dx, dy) <- passes(d.width, d.height, d.interlaced)) {
      val (pw, ph) = passDims(d.width, d.height, p)
      // pass-local (row, byteIdx) → frame position: the byte index
      // splits into (pixel-in-pass, channel); the pass grid places
      // pixel j of row i at frame (x0 + j·dx, y0 + i·dy). Palette
      // indices expand through PLTE to 3 output samples; 16-bit
      // samples reduce to their HIGH byte (the standard 16→8
      // downsample — the raster consumers are 8-bit transforms; the
      // exact 16-bit aggregates live on the stats path).
      // one reconstructed sample value at sample index `si` of the
      // pass row: palette expands through PLTE; gray/channel bytes
      // land at their frame slot (16-bit already reduced to high byte)
      def place(row: Int, si: Int, sv: Int): Unit = {
        val px = x0 + (si / rc) * dx
        val base = (y0 + row.toLong * dy).toInt * w + px * outChannels
        if (d.colorType == 3) {
          if (sv >= nColors) badIndex = true
          else {
            out(base) = d.palette(sv * 3)
            out(base + 1) = d.palette(sv * 3 + 1)
            out(base + 2) = d.palette(sv * 3 + 2)
          }
        } else out(base + si % rc) = sv.toByte
      }
      off = unfilterPass(d.raw, off, d.rowBytes(pw), ph, bpp) { (i, x, v) =>
        if (d.depth < 8) {
          val per = 8 / d.depth
          val mask = (1 << d.depth) - 1
          var j = 0
          while (j < per && x * per + j < pw) {
            place(i, x * per + j, (v >> (8 - d.depth * (j + 1))) & mask)
            j += 1
          }
        } else if (d.depth == 16) {
          if (x % 2 == 0) place(i, x / 2, v) // high byte only
        } else place(i, x, v)
      }
      if (off < 0 || badIndex) return None
    }
    Some(Pixels(d.width, d.height, outChannels, out))
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
    require(Seq(1, 2, 3, 4).contains(channels),
      "gray, gray+alpha, RGB, or RGBA")
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

    writePng(width, height, channels, interlace = 0, raw)
  }

  /** [[encode]]'s Adam7-interlaced twin (interlace byte 1): the same
    * absolute-position sample function value(y·stride + x), laid out
    * as the 7 pass sub-images, each independently filtered (filter
    * type cycles over a GLOBAL row counter so all five unfilters are
    * exercised across passes). Decoding this must produce the
    * identical [[PixelStats]] as decoding `encode(...)` of the same
    * generator — interlacing is a lossless reordering.
    */
  def encodeAdam7(width: Int, height: Int, channels: Int,
                  value: Long => Int): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    require(Seq(1, 2, 3, 4).contains(channels),
      "gray, gray+alpha, RGB, or RGBA")
    val bpp = channels
    val stride = width.toLong * channels
    val buf = new java.io.ByteArrayOutputStream()
    var globalRow = 0
    for (p @ (x0, y0, dx, dy) <- Adam7) {
      val (pw, ph) = passDims(width, height, p)
      if (pw > 0 && ph > 0) {
        val rowBytes = pw * channels
        val cur = new Array[Int](rowBytes)
        val prev = new Array[Int](rowBytes)
        for (i <- 0 until ph) {
          val fy = y0 + i * dy
          var x = 0
          while (x < rowBytes) {
            val fx = x0 + (x / channels) * dx
            cur(x) = value(fy * stride + fx.toLong * channels + x % channels) & 0xff
            x += 1
          }
          val ft = globalRow % 5
          globalRow += 1
          buf.write(ft)
          x = 0
          while (x < rowBytes) {
            val a = if (x >= bpp) cur(x - bpp) else 0
            val b = if (i > 0) prev(x) else 0
            val c = if (x >= bpp && i > 0) prev(x - bpp) else 0
            val f = ft match {
              case 0 => cur(x)
              case 1 => cur(x) - a
              case 2 => cur(x) - b
              case 3 => cur(x) - ((a + b) >> 1)
              case 4 => cur(x) - paeth(a, b, c)
            }
            buf.write(f & 0xff)
            x += 1
          }
          Array.copy(cur, 0, prev, 0, rowBytes)
        }
      }
    }
    writePng(width, height, channels, interlace = 1, buf.toByteArray)
  }

  /** zlib-compress the filtered buffer and assemble signature + IHDR +
    * IDAT + IEND with genuine CRCs — shared by both encoders.
    */
  private def writePng(width: Int, height: Int, channels: Int,
                       interlace: Int, raw: Array[Byte],
                       plte: Array[Byte] = Array.emptyByteArray,
                       depth: Int = 8): Array[Byte] = {
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
    ihdr(8) = depth.toByte
    ihdr(9) = (channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case -3 => 3 // palette sentinel from encodePalette
    }).toByte
    ihdr(12) = interlace.toByte // compression 0, filter 0 stay zeroed
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    out.write(chunk("IHDR", ihdr))
    if (plte.nonEmpty) out.write(chunk("PLTE", plte))
    out.write(chunk("IDAT", zout.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** 16-bit-depth encoder: sample s of the flat row-major buffer is
    * the 16-bit value `value(s)` (0..65535), written big-endian and
    * filtered over the true bytes-per-pixel with the y % 5 cycle so
    * every unfilter runs against multi-byte bpp offsets.
    */
  def encode16(width: Int, height: Int, channels: Int,
               value: Long => Int): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    require(Seq(1, 2, 3, 4).contains(channels),
      "gray, gray+alpha, RGB, or RGBA")
    val bpp = channels * 2
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var off = 0
    for (y <- 0 until height) {
      var x = 0
      while (x < stride) {
        val v = value(y.toLong * width * channels + x / 2) & 0xffff
        cur(x) = if (x % 2 == 0) v >> 8 else v & 0xff
        x += 1
      }
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
    writePng(width, height, channels, interlace = 0, raw, depth = 16)
  }

  /** Sub-byte-depth encoder (depth 1/2/4; gray when `palette` is
    * empty, palette indices otherwise): sample p of the row-major
    * raster is `value(p)` masked to the depth, packed MSB-first with
    * row-tail pad bits zeroed; filters cycle y % 5 over the PACKED
    * bytes at bpp = 1 (§9's at-least-one-byte rule).
    */
  def encodePacked(width: Int, height: Int, depth: Int,
                   palette: Array[Byte], value: Long => Int): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    require(Seq(1, 2, 4).contains(depth), "sub-byte depth 1, 2 or 4")
    require(palette.isEmpty || (palette.length % 3 == 0 &&
      palette.length <= 256 * 3), "RGB triples")
    val mask = (1 << depth) - 1
    val rowBytes = (width * depth + 7) / 8
    val raw = new Array[Byte](height * (1 + rowBytes))
    val cur = new Array[Int](rowBytes)
    val prev = new Array[Int](rowBytes)
    var off = 0
    for (y <- 0 until height) {
      java.util.Arrays.fill(cur, 0)
      var sx = 0
      while (sx < width) {
        val v = value(y.toLong * width + sx) & mask
        cur(sx * depth / 8) |= v << (8 - depth * (sx % (8 / depth) + 1))
        sx += 1
      }
      val ft = y % 5
      raw(off) = ft.toByte; off += 1
      var x = 0
      while (x < rowBytes) {
        val a = if (x >= 1) cur(x - 1) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= 1 && y > 0) prev(x - 1) else 0
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
      Array.copy(cur, 0, prev, 0, rowBytes)
    }
    writePng(width, height, if (palette.isEmpty) 1 else -3, interlace = 0,
      raw, plte = palette, depth = depth)
  }

  /** Palette PNG encoder (color type 3): `palette` is 1..256 RGB
    * triples; sample p of the row-major index raster is
    * `indexOf(p) % palette-size`. Filter cycles y % 5 like [[encode]]
    * so every unfilter runs over the 1-byte-per-pixel stream.
    */
  def encodePalette(width: Int, height: Int, palette: Array[Byte],
                    indexOf: Long => Int): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    require(palette.nonEmpty && palette.length % 3 == 0 &&
      palette.length <= 256 * 3, "1..256 RGB triples")
    val n = palette.length / 3
    val raw = new Array[Byte](height * (1 + width))
    val cur = new Array[Int](width)
    val prev = new Array[Int](width)
    var off = 0
    for (y <- 0 until height) {
      var x = 0
      while (x < width) {
        cur(x) = ((indexOf(y.toLong * width + x) % n) + n) % n; x += 1
      }
      val ft = y % 5
      raw(off) = ft.toByte; off += 1
      x = 0
      while (x < width) {
        val a = if (x >= 1) cur(x - 1) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= 1 && y > 0) prev(x - 1) else 0
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
      Array.copy(cur, 0, prev, 0, width)
    }
    writePng(width, height, -3, interlace = 0, raw, plte = palette)
  }
}
