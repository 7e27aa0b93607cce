package graft.multimodal

import graft.multimodal.PngCodec.PixelStats

/** Pure-JVM GIF PIXEL codec (CompuServe GIF89a specification, 1990;
  * LZW per the spec's variable-width variant of Welch 1984). GIF's
  * compression is LZW over palette indices — no external library
  * needed, so with this the remaining pixel-layer stub shrinks to
  * JPEG alone (DCT entropy decode; SURVEY.md §6).
  *
  * The DECODER is a full variable-width LZW engine: 3..8-bit roots,
  * clear/EOI handling, table growth to the 12-bit ceiling, the KwKwK
  * self-reference case, LSB-first bit unpacking across reassembled
  * data sub-blocks — it decodes any baseline GIF, interlaced or not
  * (r15: the 4-pass row reorder of Appendix E), with a global or
  * local palette (extensions skipped), not merely its own encoder's
  * output. Palette entries expand to RGB, so stats cover
  * width*height*3 samples like PNG truecolor.
  *
  * The ENCODER emits genuine GIF89a bytes (logical screen descriptor,
  * 256-entry grayscale global color table, image descriptor, LZW
  * stream) in the classic clear-flush regime: every pixel is a 9-bit
  * root code and a CLEAR resets the decoder's table before its growth
  * would widen the code — spec-conformant output any GIF reader
  * accepts, with the same closed-form-sample property the arithmetic
  * parity oracle needs.
  *
  * Garbage-safe like the other codecs: malformed, truncated, or
  * oversized payloads return None, never a throw or a hang.
  */
object GifCodec {

  private val MaxPixels = 64L * 1024 * 1024

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Decode to per-sample aggregates over the palette-expanded RGB
    * raster (channels = 3). Streaming over the index sequence — the
    * raster is never materialized; the index buffer is the only
    * allocation and it is bounded by the pixel-count guard.
    */
  def decodeStats(bytes: Array[Byte]): Option[PixelStats] = {
    decodeIndexed(bytes).map { case (w, h, palette, idx) =>
      var sum = 0L
      var sumSq = 0L
      var i = 0
      while (i < idx.length) {
        val p = (idx(i) & 0xff) * 3
        var c = 0
        while (c < 3) {
          val v = palette(p + c) & 0xff
          sum += v
          sumSq += v.toLong * v
          c += 1
        }
        i += 1
      }
      PixelStats(w, h, 3, 3L * w * h, sum, sumSq)
    }
  }

  /** Header walk + full LZW decode to (width, height, palette bytes
    * RGB*n, palette indices row-major — interlaced streams are
    * reordered to display order). None on anything malformed,
    * truncated, missing a palette, or oversized.
    */
  private[graft] def decodeIndexed(
      bytes: Array[Byte]): Option[(Int, Int, Array[Byte], Array[Byte])] = {
    if (bytes == null || bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var pos = 6
    val packed = bytes(10) & 0xff
    pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    // block walk: skip extensions, decode the FIRST image descriptor
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label byte then sub-blocks
          pos += 2
          var done = false
          while (!done) {
            if (pos >= bytes.length) return None
            val n = bytes(pos) & 0xff; pos += 1 + n
            done = n == 0
          }
        case 0x2c =>
          if (pos + 10 > bytes.length) return None
          val w = le16(bytes, pos + 5)
          val h = le16(bytes, pos + 7)
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          val interlaced = (ip & 0x40) != 0
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pos + 3 * n > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (pal == null || w <= 0 || h <= 0 || w.toLong * h > MaxPixels)
            return None
          return lzwDecode(bytes, pos, w.toLong * h, pal.length / 3)
            .map(idx => (w, h, pal,
              if (interlaced) deinterlace(idx, w, h) else idx))
        case _ => return None
      }
    }
    None
  }

  /** GIF interlace (r15): the LZW stream carries rows in 4-pass order
    * — pass 1 rows 0,8,16…, pass 2 rows 4,12…, pass 3 rows 2,6,10…,
    * pass 4 rows 1,3,5… (spec Appendix E). Reorder the decoded index
    * rows into display order; one row-granular copy, same buffer
    * size.
    */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var srcRow = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
         y <- start.until(h, step)) {
      System.arraycopy(idx, srcRow * w, out, y * w, w)
      srcRow += 1
    }
    out
  }

  /** Variable-width GIF LZW over the data sub-blocks starting at
    * `pos` (min-code-size byte first). Decodes exactly `nPixels`
    * indices; every index is validated against the palette size.
    */
  private def lzwDecode(bytes: Array[Byte], pos0: Int, nPixels: Long,
                        paletteSize: Int): Option[Array[Byte]] = {
    if (pos0 >= bytes.length) return None
    val minCode = bytes(pos0) & 0xff
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](nPixels.toInt)
    var outLen = 0

    // dictionary as prefix-link + last-byte arrays (4096 ceiling)
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    val strLen = new Array[Int](4096)
    var i = 0
    while (i < clear) {
      prefix(i) = -1; last(i) = i.toByte; strLen(i) = 1; i += 1
    }
    var next = clear + 2
    var width = minCode + 1
    var prev = -1

    // LSB-first bit reader across sub-blocks
    var pos = pos0 + 1
    var blockLeft = 0
    var acc = 0L
    var accBits = 0

    def emit(code: Int): Boolean = {
      // walk the prefix chain, writing the string back-to-front
      val n = strLen(code)
      if (outLen + n > out.length) return false
      var c = code
      var j = outLen + n - 1
      while (c != -1) { out(j) = last(c); j -= 1; c = prefix(c) }
      outLen += n
      true
    }

    while (outLen < out.length) {
      while (accBits < width) {
        if (blockLeft == 0) {
          if (pos >= bytes.length) return None
          blockLeft = bytes(pos) & 0xff; pos += 1
          if (blockLeft == 0) return None // terminator before all pixels
        }
        if (pos >= bytes.length) return None
        acc |= (bytes(pos) & 0xffL) << accBits
        accBits += 8; pos += 1; blockLeft -= 1
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; accBits -= width

      if (code == clear) {
        next = clear + 2; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outLen == out.length) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear || code >= paletteSize) return None
        if (!emit(code)) return None
        prev = code
      } else {
        val defined = code < next && (code < clear || code >= clear + 2)
        if (!defined && code != next) return None
        if (code < clear && code >= paletteSize) return None
        // add prev + firstChar(cur) — for the KwKwK case (code == next)
        // the new entry itself is the code being emitted
        if (next < 4096) {
          val cur = if (code == next) prev else code
          // first char of cur's string
          var c = cur
          while (prefix(c) != -1) c = prefix(c)
          prefix(next) = prev; last(next) = last(c)
          strLen(next) = strLen(prev) + 1
          next += 1
        } else if (code == next) return None
        if (!emit(code)) return None
        if (next < 4096 && next == (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    Some(out)
  }

  /** Real GIF89a bytes: WxH non-interlaced, 256-entry grayscale
    * global palette (index i -> (i,i,i)), pixel index at offset s =
    * value(s) & 0xff. Clear-flush LZW (every pixel a 9-bit root code,
    * CLEAR before the decoder's table would widen the code) — valid
    * output for any conforming reader.
    */
  def encode(width: Int, height: Int, value: Int => Int): Array[Byte] =
    encodeImpl(width, height, value, interlaced = false)

  /** [[encode]]'s interlaced twin (image-descriptor flag 0x40): the
    * SAME display-order sample function value(s), with rows emitted
    * into the LZW stream in the 4-pass order the decoder must undo —
    * decoding must reproduce the identical stats/raster as the
    * progressive encoding (interlace is a lossless reordering).
    */
  def encodeInterlaced(width: Int, height: Int,
                       value: Int => Int): Array[Byte] =
    encodeImpl(width, height, value, interlaced = true)

  private def encodeImpl(width: Int, height: Int, value: Int => Int,
                         interlaced: Boolean): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    // stream row order: display order, or the 4-pass interleave
    val rowOrder: Seq[Int] =
      if (!interlaced) 0 until height
      else Seq((0, 8), (4, 8), (2, 4), (1, 2))
        .flatMap { case (start, step) => start.until(height, step) }
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    w8(0xf7) // GCT present, 8-bit color resolution, 256 entries
    w8(0); w8(0)
    var i = 0
    while (i < 256) { w8(i); w8(i); w8(i); i += 1 }
    w8(0x2c); w16(0); w16(0); w16(width); w16(height)
    w8(if (interlaced) 0x40 else 0)
    w8(8) // LZW min code size

    // 9-bit LSB-first writer, flushed into <=255-byte sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    def put(code: Int): Unit = {
      acc |= (code.toLong & 0x1ff) << accBits
      accBits += 9
      while (accBits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    val clear = 256
    val eoi = 257
    put(clear)
    var count = 0
    for (y <- rowOrder) {
      var x = 0
      while (x < width) {
        put(value(y * width + x) & 0xff)
        count += 1
        // decoder table: 258 + (codes since clear) - 1; flush before
        // it reaches 511 so the 9-bit width never has to grow
        if (count == 250) { put(clear); count = 0 }
        x += 1
      }
    }
    put(eoi)
    if (accBits > 0) data.write((acc & 0xff).toInt)
    val packed = data.toByteArray
    var off = 0
    while (off < packed.length) {
      val len = math.min(255, packed.length - off)
      w8(len); bos.write(packed, off, len)
      off += len
    }
    w8(0); w8(0x3b)
    bos.toByteArray
  }
}
