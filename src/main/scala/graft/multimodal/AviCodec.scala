package graft.multimodal

/** Pure-JVM AVI (RIFF) codec for uncompressed 24-bit DIB video: real
  * container parsing + real frame decode, no video library. AVI with
  * BI_RGB frames is the video analogue of PCM WAV — the container is
  * a nested RIFF chunk walk (Microsoft AVI 1.0 / OpenDML spec, public
  * since 1992) and each '00db' frame payload is raw bottom-up BGR
  * rows padded to 4-byte boundaries — so the VIDEO modality can be
  * fully real in this environment, exactly like audio ([[WavCodec]])
  * and PNG stills ([[PngCodec]]). Compressed video (H.264, VP9, ...)
  * is entropy coding and genuinely needs a codec library; that path
  * stays a declared stub, the container/metadata/frame-sampling
  * layer below is real.
  *
  * Integration shape matches the sibling codecs: `encode` emits
  * genuine format bytes any AVI-aware tool parses; `decodeMeta` /
  * `decodeFrameStats` invert them into exact integer aggregates (no
  * float accumulation, engine-portable); anything malformed — bad
  * magic, overrunning chunk, non-BI_RGB stream, short frame — yields
  * None, never an exception or unbounded loop (garbage-safe for
  * untrusted 100 TB corpora).
  *
  * The reference has no video surface; this is LLM-pipeline
  * capability (brief: multimodal columns, frame-sample).
  */
object AviCodec {

  /** Container-level metadata from the main AVI header. */
  final case class VideoMeta(width: Int, height: Int, nFrames: Int,
                             usPerFrame: Long, durationUs: Long)

  /** Exact per-frame aggregates over the frame's w*h*3 channel bytes
    * (row padding excluded). Sample s of a frame is the byte at
    * canonical index s — storage order (bottom-up BGR) never shows
    * through aggregates.
    */
  final case class FrameStats(frameNo: Int, nSamples: Long,
                              sumVal: Long, sumSq: Long)

  private def le16u(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) { if (b(i + k) != s.charAt(k).toByte) return false; k += 1 }
    true
  }

  /** DIB rows pad to 32-bit boundaries. */
  private def rowBytes(width: Int): Int = (width * 3 + 3) & ~3

  /** Parsed layout: header fields + movi chunk bounds. */
  private final case class Layout(width: Int, height: Int, nFrames: Int,
                                  usPerFrame: Long, moviOff: Int, moviEnd: Int)

  /** One validated RIFF walk shared by the public decoders. Requires
    * the single stream to be 'vids' with BI_RGB 24bpp and positive
    * (bottom-up) height; rejects anything that overruns the payload.
    */
  private def parseLayout(bytes: Array[Byte]): Option[Layout] = {
    if (bytes == null || bytes.length < 12) return None
    if (!ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "AVI ")) return None
    var width, height, nFrames = -1
    var usPerFrame = -1L
    var biOk = false
    var moviOff, moviEnd = -1

    var pos = 12
    while (pos + 8 <= bytes.length) {
      val len = le32(bytes, pos + 4)
      if (pos + 8 + len > bytes.length) return None
      if (ascii(bytes, pos, "LIST") && len >= 4) {
        val listEnd = pos + 8 + len.toInt
        if (ascii(bytes, pos + 8, "hdrl")) {
          // walk the header list: avih + nested LIST strl (strh/strf)
          var p2 = pos + 12
          while (p2 + 8 <= listEnd) {
            val l2 = le32(bytes, p2 + 4)
            if (p2 + 8 + l2 > listEnd) return None
            if (ascii(bytes, p2, "avih") && l2 >= 56) {
              usPerFrame = le32(bytes, p2 + 8)
              nFrames = le32(bytes, p2 + 24).toInt
              width = le32(bytes, p2 + 40).toInt
              height = le32(bytes, p2 + 44).toInt
            } else if (ascii(bytes, p2, "LIST") && l2 >= 4 &&
              ascii(bytes, p2 + 8, "strl")) {
              var p3 = p2 + 12
              val strlEnd = p2 + 8 + l2.toInt
              while (p3 + 8 <= strlEnd) {
                val l3 = le32(bytes, p3 + 4)
                if (p3 + 8 + l3 > strlEnd) return None
                if (ascii(bytes, p3, "strh") && l3 >= 8) {
                  if (!ascii(bytes, p3 + 8, "vids")) return None
                } else if (ascii(bytes, p3, "strf") && l3 >= 40) {
                  // BITMAPINFOHEADER: planes 1, 24bpp, BI_RGB,
                  // positive height (bottom-up rows)
                  biOk = le16u(bytes, p3 + 8 + 12) == 1 &&
                    le16u(bytes, p3 + 8 + 14) == 24 &&
                    le32(bytes, p3 + 8 + 16) == 0L &&
                    le32(bytes, p3 + 8 + 8).toInt > 0
                }
                p3 += 8 + l3.toInt + (l3.toInt & 1)
              }
            }
            p2 += 8 + l2.toInt + (l2.toInt & 1)
          }
        } else if (ascii(bytes, pos + 8, "movi")) {
          moviOff = pos + 12
          moviEnd = listEnd
        }
      }
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    if (width <= 0 || width > (1 << 15) || height <= 0 || height > (1 << 15))
      return None
    if (nFrames < 0 || usPerFrame <= 0 || !biOk || moviOff < 0) return None
    Some(Layout(width, height, nFrames, usPerFrame, moviOff, moviEnd))
  }

  /** Container metadata, or None for anything malformed/unsupported. */
  def decodeMeta(bytes: Array[Byte]): Option[VideoMeta] =
    parseLayout(bytes).map { l =>
      VideoMeta(l.width, l.height, l.nFrames, l.usPerFrame,
        l.nFrames.toLong * l.usPerFrame)
    }

  /** Frame sampling: exact integer aggregates for every `stride`-th
    * frame (0, stride, 2·stride, ...) — the "decode 1 frame per
    * second, not 30" pass. Only sampled frames touch pixel bytes;
    * skipped frames cost one chunk-header hop each. None if the
    * container is malformed, a frame chunk is not exactly
    * rowBytes·height long, or the movi walk disagrees with the
    * header's frame count.
    */
  def decodeFrameStats(bytes: Array[Byte], stride: Int = 1): Option[Seq[FrameStats]] = {
    require(stride >= 1, "stride >= 1")
    val l = parseLayout(bytes) match {
      case Some(x) => x
      case None => return None
    }
    val rb = rowBytes(l.width)
    val expectLen = rb.toLong * l.height
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
    var frame = 0
    var pos = l.moviOff
    while (pos + 8 <= l.moviEnd) {
      val len = le32(bytes, pos + 4)
      if (pos + 8 + len > l.moviEnd) return None
      if (ascii(bytes, pos, "00db")) {
        if (len != expectLen) return None
        if (frame % stride == 0) {
          var sum = 0L
          var sumSq = 0L
          val dataOff = pos + 8
          var y = 0
          while (y < l.height) {
            var i = dataOff + y * rb
            val iEnd = i + l.width * 3 // aggregate pixels, skip row pad
            while (i < iEnd) {
              val v = bytes(i) & 0xff
              sum += v
              sumSq += v.toLong * v
              i += 1
            }
            y += 1
          }
          out += FrameStats(frame, l.width.toLong * l.height * 3, sum, sumSq)
        }
        frame += 1
      }
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    if (frame != l.nFrames) return None
    Some(out.toSeq)
  }

  final case class FramePooled(frameNo: Int, cy: Int, cx: Int,
                               nPx: Long, nSamples: Long, sumVal: Long)

  /** Per-frame grid mean-pooling over every `stride`-th frame — the
    * video half of the pooled-feature extractor: each sampled frame's
    * DIB raster is binned onto a gy x gx grid (canonical top-down
    * coordinates: stored row r is logical y = height-1-r, bottom-up
    * DIB) with exact integer counts and channel-sample sums per cell.
    * Same walk and guards as [[decodeFrameStats]].
    */
  def decodeFramePooled(bytes: Array[Byte], stride: Int = 1,
                        gy: Int = 2, gx: Int = 2): Option[Seq[FramePooled]] = {
    require(stride >= 1 && gy >= 1 && gx >= 1, "stride and grid dims >= 1")
    val l = parseLayout(bytes) match {
      case Some(x) => x
      case None => return None
    }
    val rb = rowBytes(l.width)
    val expectLen = rb.toLong * l.height
    val out = scala.collection.mutable.ArrayBuffer.empty[FramePooled]
    var frame = 0
    var pos = l.moviOff
    while (pos + 8 <= l.moviEnd) {
      val len = le32(bytes, pos + 4)
      if (pos + 8 + len > l.moviEnd) return None
      if (ascii(bytes, pos, "00db")) {
        if (len != expectLen) return None
        if (frame % stride == 0) {
          val n = new Array[Long](gy * gx)
          val s = new Array[Long](gy * gx)
          val dataOff = pos + 8
          var r = 0
          while (r < l.height) {
            val y = l.height - 1 - r
            val cyBase = (y * gy / l.height) * gx
            val rowOff = dataOff + r * rb
            var x = 0
            while (x < l.width) {
              val cell = cyBase + x * gx / l.width
              n(cell) += 1
              var i = rowOff + x * 3
              val iEnd = i + 3
              while (i < iEnd) { s(cell) += bytes(i) & 0xff; i += 1 }
              x += 1
            }
            r += 1
          }
          var cell = 0
          while (cell < gy * gx) {
            if (n(cell) > 0)
              out += FramePooled(frame, cell / gx, cell % gx,
                n(cell), n(cell) * 3, s(cell))
            cell += 1
          }
        }
        frame += 1
      }
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    if (frame != l.nFrames) return None
    Some(out.toSeq)
  }

  /** Encode a real AVI: RIFF('AVI ') + LIST hdrl (avih, LIST strl
    * (strh 'vids'/'DIB ', strf BITMAPINFOHEADER BI_RGB 24bpp)) + LIST
    * movi with one '00db' uncompressed DIB chunk per frame. Sample s
    * of frame f (canonical index: (y·width + x)·3 + channel, top-down,
    * BGR) is `value(f, s) & 0xff`; the writer places it at the DIB's
    * bottom-up physical position, so decode-side aggregates see the
    * canonical closed form regardless of storage order. Row padding
    * is zeroed.
    */
  def encode(width: Int, height: Int, nFrames: Int, usPerFrame: Long,
             value: (Int, Long) => Int): Array[Byte] = {
    require(width >= 1 && width <= (1 << 15), "width 1..32768")
    require(height >= 1 && height <= (1 << 15), "height 1..32768")
    require(nFrames >= 0, "non-negative frame count")
    require(usPerFrame >= 1, "positive frame interval")
    val rb = rowBytes(width)
    // Long first: rb * height overflows Int at the permitted max dims
    // (32768 x 32768), which would turn the payload require into a
    // comparison against a negative number
    val frameLenL = rb.toLong * height
    require(nFrames.toLong * (8 + frameLenL) <= 64L * 1024 * 1024, "payload cap 64 MiB")
    val frameLen = frameLenL.toInt

    val hdrlLen = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val moviLen = 4 + nFrames * (8 + frameLen)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val out = new Array[Byte](8 + riffLen)

    var pos = 0
    def w16(v: Int): Unit = {
      out(pos) = (v & 0xff).toByte; out(pos + 1) = ((v >> 8) & 0xff).toByte
      pos += 2
    }
    def w32(v: Long): Unit = {
      out(pos) = (v & 0xff).toByte; out(pos + 1) = ((v >> 8) & 0xff).toByte
      out(pos + 2) = ((v >> 16) & 0xff).toByte; out(pos + 3) = ((v >> 24) & 0xff).toByte
      pos += 4
    }
    def wascii(s: String): Unit = {
      var k = 0
      while (k < s.length) { out(pos + k) = s.charAt(k).toByte; k += 1 }
      pos += s.length
    }

    wascii("RIFF"); w32(riffLen); wascii("AVI ")
    wascii("LIST"); w32(hdrlLen); wascii("hdrl")
    wascii("avih"); w32(56)
    w32(usPerFrame) // dwMicroSecPerFrame
    w32(0); w32(0) // dwMaxBytesPerSec, dwPaddingGranularity
    w32(0) // dwFlags: no idx1 index is written, so AVIF_HASINDEX stays off
    w32(nFrames); w32(0) // dwTotalFrames, dwInitialFrames
    w32(1); w32(frameLen.toLong) // dwStreams, dwSuggestedBufferSize
    w32(width); w32(height)
    w32(0); w32(0); w32(0); w32(0) // dwReserved
    wascii("LIST"); w32(4 + (8 + 56) + (8 + 40)); wascii("strl")
    wascii("strh"); w32(56)
    wascii("vids"); wascii("DIB ")
    w32(0); w16(0); w16(0) // dwFlags, wPriority, wLanguage
    w32(0) // dwInitialFrames
    w32(usPerFrame); w32(1000000L) // dwScale/dwRate = frame interval
    w32(0); w32(nFrames) // dwStart, dwLength
    w32(frameLen.toLong); w32(0xFFFFFFFFL) // dwSuggestedBufferSize, dwQuality (-1 = default)
    w32(0) // dwSampleSize (0: one sample = one frame)
    w16(0); w16(0); w16(width); w16(height) // rcFrame
    wascii("strf"); w32(40)
    w32(40); w32(width); w32(height) // biSize, biWidth, biHeight (+: bottom-up)
    w16(1); w16(24) // biPlanes, biBitCount
    w32(0); w32(frameLen.toLong) // biCompression = BI_RGB, biSizeImage
    w32(0); w32(0); w32(0); w32(0) // ppm, clrUsed, clrImportant
    wascii("LIST"); w32(moviLen); wascii("movi")
    var f = 0
    while (f < nFrames) {
      wascii("00db"); w32(frameLen.toLong)
      val base = pos
      var y = 0
      while (y < height) {
        // physical row y stores canonical (top-down) row height-1-y
        val cy = height - 1 - y
        var x = 0
        while (x < width * 3) {
          val s = cy.toLong * width * 3 + x
          out(base + y * rb + x) = (value(f, s) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      pos += frameLen
      f += 1
    }
    out
  }
}
