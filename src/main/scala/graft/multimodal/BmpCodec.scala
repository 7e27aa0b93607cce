package graft.multimodal

/** Pure-JVM BMP (Windows DIB) decode — the remaining uncompressed
  * raster format a 100 TB crawl's image pass will hit (BMP needs no
  * entropy engine, but its quirks — little-endian headers, BGR sample
  * order, 4-byte row padding, BOTTOM-UP default row order, optional
  * top-down via negative height, 8-bit palette indirection — are
  * exactly the byte-level work that is not Catalyst-expressible, so it
  * sits behind the same mapPartitions plumbing as PngCodec/GifCodec).
  *
  * Support envelope: BITMAPINFOHEADER (or larger) with BI_RGB
  * (uncompressed) at 24/32 bpp, and 8 bpp through a BGRA palette
  * expanded to RGB. Anything else (RLE, 1/4/16 bpp, core headers)
  * returns None — callers map None to a null-stats row, never an
  * exception (garbage-safe, the codec family contract).
  *
  * Reference: Microsoft's public BITMAPFILEHEADER/BITMAPINFOHEADER
  * layout (Win32 wingdi.h documentation).
  */
object BmpCodec {

  import PngCodec.{PixelStats, Pixels}

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def s32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Parsed geometry: (width, height, bpp, topDown, dataOffset,
    * palette or null). */
  private def header(b: Array[Byte])
      : Option[(Int, Int, Int, Boolean, Int, Array[Byte])] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = s32(b, 10)
    val hdrSize = s32(b, 14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER etc. unsupported
    val width = s32(b, 18)
    val rawH = s32(b, 22)
    val bpp = u16(b, 28)
    val compression = s32(b, 30)
    if (width <= 0 || rawH == 0 || compression != 0) return None
    if (bpp != 24 && bpp != 32 && bpp != 8) return None
    val topDown = rawH < 0
    val height = math.abs(rawH)
    // 256 MiB raster guard (the PngCodec inflate-guard policy)
    if (width.toLong * height * 3 > 256L * 1024 * 1024) return None
    val pal: Array[Byte] =
      if (bpp == 8) {
        val clrUsed = s32(b, 46)
        val n = if (clrUsed > 0) clrUsed else 256
        val palOff = 14 + hdrSize
        if (n > 256 || palOff + 4L * n > b.length) return None
        java.util.Arrays.copyOfRange(b, palOff, palOff + 4 * n)
      } else null
    val rowBytes = ((width.toLong * bpp / 8 + 3) / 4) * 4
    if (dataOff < 0 || dataOff + rowBytes * height > b.length) return None
    Some((width, height, bpp, topDown, dataOff, pal))
  }

  /** Decode the full raster to row-major RGB (3 channels; 32 bpp drops
    * alpha, palette rows expand through the BGRA quads). */
  def decodePixels(bytes: Array[Byte]): Option[Pixels] = {
    val (w, h, bpp, topDown, off, pal) = header(bytes) match {
      case Some(t) => t
      case None => return None
    }
    val bytesPerPx = bpp / 8
    val rowBytes = ((w.toLong * bpp / 8 + 3) / 4).toInt * 4
    val out = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val base = off + srcRow.toLong * rowBytes
      var x = 0
      while (x < w) {
        val o = (row * w + x) * 3
        if (bpp == 8) {
          val idx = bytes((base + x).toInt) & 0xff
          if (pal == null || idx * 4 + 2 >= pal.length) return None
          out(o) = pal(idx * 4 + 2)     // palette quads are B,G,R,A
          out(o + 1) = pal(idx * 4 + 1)
          out(o + 2) = pal(idx * 4)
        } else {
          val p = (base + x.toLong * bytesPerPx).toInt
          out(o) = bytes(p + 2)          // BGR(A) -> RGB
          out(o + 1) = bytes(p + 1)
          out(o + 2) = bytes(p)
        }
        x += 1
      }
      row += 1
    }
    Some(Pixels(w, h, 3, out))
  }

  /** Exact integer sample aggregates over the decoded RGB raster —
    * the stats-not-rasters shape every wired multimodal query uses. */
  def decodeStats(bytes: Array[Byte]): Option[PixelStats] =
    decodePixels(bytes).map { px =>
      var sum = 0L; var sumSq = 0L; var i = 0
      while (i < px.data.length) {
        val v = px.data(i) & 0xff
        sum += v; sumSq += v.toLong * v; i += 1
      }
      PixelStats(px.width, px.height, 3,
        px.width.toLong * px.height * 3, sum, sumSq)
    }

  /** Encode a 24 bpp bottom-up BI_RGB BMP from a sample function
    * (x, y, channel RGB) -> value — the test-side round-trip source
    * and the wired query's synthetic-blob generator (the
    * PngCodec.encode role). `topDown` exercises the negative-height
    * branch.
    */
  def encode(w: Int, h: Int, sample: (Int, Int, Int) => Int,
             topDown: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, "positive dimensions")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataSize); put32(10, 54)
    put32(14, 40); put32(18, w); put32(22, if (topDown) -h else h)
    put16(26, 1); put16(28, 24); put32(30, 0); put32(34, dataSize)
    var y = 0
    while (y < h) {
      val destRow = if (topDown) y else h - 1 - y
      val base = 54 + destRow * rowBytes
      var x = 0
      while (x < w) {
        val o = base + x * 3
        out(o) = (sample(x, y, 2) & 0xff).toByte     // B
        out(o + 1) = (sample(x, y, 1) & 0xff).toByte // G
        out(o + 2) = (sample(x, y, 0) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }
}
