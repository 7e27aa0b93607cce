package graft.multimodal

import graft.multimodal.PngCodec.PixelStats

/** Pure-JVM BASELINE JPEG decoder (ITU-T T.81 / ISO 10918-1, public
  * specification; JFIF container) — grayscale baseline needs no codec
  * library at all, so with this the declared multimodal pixel stub
  * shrinks to the learned feature encoder alone (SURVEY.md §6).
  *
  * The full entropy layer is real:
  *  - marker segment walk (SOI, APPn/COM skip, DQT quantization
  *    tables, DHT Huffman tables, DRI restart interval, SOF0, SOS);
  *  - canonical Huffman table construction from DHT BITS/HUFFVAL
  *    exactly as T.81 Annex C specifies (mincode/maxcode/valptr) —
  *    the decoder reads WHATEVER tables the stream declares, it has
  *    no tables of its own;
  *  - the entropy-coded scan: MSB-first bit unpacking with 0xFF00
  *    byte-unstuffing, RSTn restart handling (bit-realign + DC
  *    predictor reset), the DC difference chain (category code +
  *    T.81 F.2.2.1 EXTEND sign reconstruction, cumulative predictor),
  *    and AC run/size decoding (EOB / ZRL / (r,s)) through the
  *    zigzag order into the natural-order coefficient block.
  *
  * Reconstruction takes two paths:
  *  - DC-only blocks (every AC zero) use the exact closed form —
  *    all 64 samples = round(DC * Q(0,0) / 8) + 128, clamped — pure
  *    integer arithmetic, which is what lets the multimodal_jpeg
  *    parity oracle recompute aggregates with no codec;
  *  - AC-bearing blocks go through dequantization and a real
  *    separable 2-D inverse DCT (floating point, rounded + clamped
  *    per the spec) — plain math, gated by round-trip specs against
  *    an independent test-side forward-DCT encoder (the GifCodec
  *    general-LZW pattern).
  *
  * Decoder scope: 8-bit baseline (SOF0), single-component
  * (grayscale), 1x1 sampling. Garbage-safe like the other codecs:
  * malformed or truncated payloads return None.
  */
object JpegCodec {

  private val MaxPixels = 64L * 1024 * 1024

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Canonical Huffman decode tables per T.81 Annex C/F: for each code
    * length l (1..16), the smallest and largest code of that length and
    * the index of its first symbol in HUFFVAL.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + (code - minCode(len))) & 0xff
  }

  /** MSB-first bit reader over the entropy-coded segment with FF00
    * unstuffing. A restart marker (FFD0-FFD7) is a hard boundary:
    * fill() STOPS in front of it without consuming it and without
    * touching already-buffered bits — the undecoded pre-marker
    * entropy bits stay available to the current interval's last MCU.
    * The caller realigns at the MCU-count boundary via [[resync]],
    * which discards only the (sub-byte) pad bits left in the buffer
    * and then consumes the marker. Any other marker ends the scan.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var ended = false

    private def fill(): Unit = {
      while (nbits <= 24 && !ended) {
        if (pos >= b.length) { ended = true; return }
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) { ended = true; return }
          val m = b(pos + 1) & 0xff
          if (m == 0x00) {
            acc = (acc << 8) | 0xff; nbits += 8; pos += 2
          } else if (m >= 0xd0 && m <= 0xd7) {
            return // stop AT the marker; only resync() may cross it
          } else { ended = true; return } // EOI or next segment
        } else {
          acc = (acc << 8) | v; nbits += 8; pos += 1
        }
      }
    }

    /** Next single bit, or -1 when no bit is available — end of scan
      * data, or stalled in front of a restart marker (a well-formed
      * caller resync()s at the MCU boundary before that happens).
      */
    def bit(): Int = {
      if (nbits == 0) {
        fill()
        if (nbits == 0) return -1
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }

    /** Restart-interval boundary: every byte before the marker is
      * already buffered (the interval's last data bit forced its byte
      * in, and padding is sub-byte by T.81), so whatever remains in
      * the buffer is 1-padding — discard it, then require and consume
      * the RSTn marker. False if the marker isn't there (corrupt or
      * mis-declared DRI).
      */
    def resync(): Boolean = {
      acc = 0; nbits = 0
      if (pos + 1 >= b.length) { ended = true; return false }
      if ((b(pos) & 0xff) == 0xff) {
        val m = b(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
      }
      false
    }

    /** n bits MSB-first, or -1 on exhaustion. */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude code to its signed
    * coefficient value.
    */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  /** T.81 Figure A.6 zigzag order: ZigZag(k) = the natural (row-major)
    * position of the k-th coefficient in transmission order.
    */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1) u pi / 16) * C(u)/2 for the 2-D IDCT, precomputed —
    * IDCT is plain math, no codec library: f(x,y) = sum_u sum_v
    * basis(x,u) * basis(y,v) * F(u,v).
    */
  private val IdctBasis: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Full 8x8 inverse DCT of dequantized coefficients (natural order)
    * + level shift + clamp. Separable: rows then columns.
    */
  private def idctBlock(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // 1-D over u for each row y? separable: first columns (v), then rows (u)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += IdctBasis(x)(v) * coef(y * 8 + v); v += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += IdctBasis(yy)(u) * tmp(u * 8 + x); u += 1 }
        val p = 128 + Math.round(s).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
    out
  }

  private def decodeHuff(r: BitReader, t: HuffTable): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      val b = r.bit()
      if (b < 0) return -1
      code = (code << 1) | b
      len += 1
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len) &&
        code >= t.minCode(len)) return t.value(len, code)
    }
    -1
  }

  /** Decode a baseline grayscale JPEG to exact integer aggregates.
    * None for anything outside the documented scope.
    */
  def decodeStats(bytes: Array[Byte]): Option[PixelStats] = {
    var sum = 0L
    var sumSq = 0L
    decodeBlocks(bytes, (_, _) => ()) { (_, _, nx, ny, flat, px) =>
      if (px == null) { // DC-only closed form: one value for the block
        val cnt = nx.toLong * ny
        sum += flat.toLong * cnt
        sumSq += flat.toLong * flat * cnt
      } else {
        var yy = 0
        while (yy < ny) {
          var xx = 0
          while (xx < nx) {
            val v = px(yy * 8 + xx).toLong
            sum += v
            sumSq += v * v
            xx += 1
          }
          yy += 1
        }
      }
    }.map { case (w, h) =>
      PixelStats(w, h, 1, w.toLong * h, sum, sumSq)
    }
  }

  /** Full decoded raster (row-major), for spec-side pixel comparison
    * against the independent forward-DCT test encoder.
    */
  private[graft] def decodeRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var out: Array[Int] = null
    var w0 = 0
    decodeBlocks(bytes, (w, h) => { w0 = w; out = new Array[Int](w * h) }) {
      (bx, by, nx, ny, flat, px) =>
        var yy = 0
        while (yy < ny) {
          var xx = 0
          while (xx < nx) {
            out((by * 8 + yy) * w0 + bx * 8 + xx) =
              if (px == null) flat else px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
    }.map { case (w, h) => (w, h, out) }
  }

  /** Shared marker-walk + entropy-decode core. `onDims` fires once
    * after the headers parse (before any block); `onBlock` receives,
    * per block, its grid position, the in-image sample window
    * (nx, ny), and EITHER a flat DC-only value (px == null) or the
    * 8x8 IDCT raster. Returns the image dims, or None on anything
    * malformed.
    */
  private def decodeBlocks(bytes: Array[Byte], onDims: (Int, Int) => Unit)(
      onBlock: (Int, Int, Int, Int, Int, Array[Int]) => Unit): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = 0
    var height = 0
    var tq = -1 // quant table id of the single component
    var td = -1
    var ta = -1
    var restartInterval = 0
    var pos = 2
    var scanStart = -1
    try {
      var done = false
      while (!done) {
        if (pos + 1 >= bytes.length) return None
        if ((bytes(pos) & 0xff) != 0xff) return None
        var marker = bytes(pos + 1) & 0xff
        pos += 2
        while (marker == 0xff) { // fill bytes before a marker are legal
          if (pos >= bytes.length) return None
          marker = bytes(pos) & 0xff; pos += 1
        }
        marker match {
          case 0xd9 => return None // EOI before any scan
          case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside scan
          case _ =>
            if (pos + 1 >= bytes.length) return None
            val len = be16(bytes, pos)
            if (len < 2 || pos + len > bytes.length) return None
            val end = pos + len
            var p = pos + 2
            marker match {
              case 0xdb => // DQT — one or more tables
                while (p < end) {
                  val pq = (bytes(p) & 0xff) >> 4
                  val id = bytes(p) & 0x0f
                  p += 1
                  if (id > 3) return None
                  val tab = new Array[Int](64)
                  var i = 0
                  while (i < 64) {
                    if (pq == 0) { tab(i) = bytes(p) & 0xff; p += 1 }
                    else { tab(i) = be16(bytes, p); p += 2 }
                    i += 1
                  }
                  quant(id) = tab
                }
              case 0xc4 => // DHT — one or more tables
                while (p < end) {
                  val tc = (bytes(p) & 0xff) >> 4
                  val th = bytes(p) & 0x0f
                  p += 1
                  if (th > 3 || tc > 1) return None
                  val bits = new Array[Int](16)
                  var total = 0
                  var i = 0
                  while (i < 16) { bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1 }
                  p += 16
                  if (total > 256 || p + total > end) return None
                  val vals = java.util.Arrays.copyOfRange(bytes, p, p + total)
                  p += total
                  val t = new HuffTable(bits, vals)
                  if (tc == 0) dcTabs(th) = t else acTabs(th) = t
                }
              case 0xc0 => // SOF0 baseline
                val precision = bytes(p) & 0xff
                height = be16(bytes, p + 1)
                width = be16(bytes, p + 3)
                val nc = bytes(p + 5) & 0xff
                if (precision != 8 || nc != 1) return None // documented scope
                if (width <= 0 || height <= 0 ||
                  width.toLong * height > MaxPixels) return None
                val sampling = bytes(p + 7) & 0xff
                if (sampling != 0x11) return None
                tq = bytes(p + 8) & 0x0f
              case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                   0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
                return None // non-baseline SOF
              case 0xdd => // DRI
                restartInterval = be16(bytes, p)
              case 0xda => // SOS
                val ns = bytes(p) & 0xff
                if (ns != 1) return None
                td = (bytes(p + 2) & 0xff) >> 4
                ta = bytes(p + 2) & 0x0f
                scanStart = end // entropy data begins after the header
                done = true
              case _ => // APPn, COM, anything else: skip
            }
            pos = end
        }
      }
      if (width == 0 || tq < 0 || quant(tq) == null ||
        dcTabs(td) == null || acTabs(ta) == null) return None
      val qt = quant(tq) // zigzag-ordered, per DQT
      val q00 = qt(0)
      val dcT = dcTabs(td)
      val acT = acTabs(ta)
      val bw = (width + 7) / 8
      val bh = (height + 7) / 8
      onDims(width, height)
      val r = new BitReader(bytes, scanStart)
      var dcPred = 0
      var blocksUntilRestart =
        if (restartInterval > 0) restartInterval else Int.MaxValue
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          // DC: category + EXTEND, differential vs previous block
          val s = decodeHuff(r, dcT)
          if (s < 0 || s > 11) return None
          val diffBits = if (s == 0) 0 else r.bits(s)
          if (diffBits < 0) return None
          dcPred += extend(diffBits, s)
          // AC: run/size symbols in zigzag order, dequantized into the
          // natural-order coefficient block
          val coef = new Array[Int](64)
          var anyAc = false
          var k = 1
          var eob = false
          while (!eob && k <= 63) {
            val rs = decodeHuff(r, acT)
            if (rs < 0) return None
            if (rs == 0x00) eob = true
            else if (rs == 0xf0) k += 16 // ZRL: sixteen zeros
            else {
              val run = rs >> 4
              val size = rs & 0x0f
              val v = r.bits(size)
              if (v < 0) return None
              k += run
              if (k > 63) return None
              val ac = extend(v, size)
              if (ac != 0) {
                coef(ZigZag(k)) = ac * qt(k) // quant table is zigzag-ordered
                anyAc = true
              }
              k += 1
            }
          }
          val nx = math.min(8, width - bx * 8)
          val ny = math.min(8, height - by * 8)
          if (!anyAc) {
            // DC-only IDCT closed form: all 64 samples = DC*Q00/8+128
            // — exact integer arithmetic, the oracle-gated path
            val v = {
              val x = 128 + Math.round(dcPred.toDouble * q00 / 8.0).toInt
              if (x < 0) 0 else if (x > 255) 255 else x
            }
            onBlock(bx, by, nx, ny, v, null)
          } else {
            // the general baseline path: full dequant + 2-D IDCT
            coef(0) = dcPred * q00
            onBlock(bx, by, nx, ny, 0, idctBlock(coef))
          }
          blocksUntilRestart -= 1
          val lastBlock = bx == bw - 1 && by == bh - 1
          if (blocksUntilRestart == 0 && !lastBlock) {
            // interval boundary: drop pad bits, consume RSTn, reset
            // the DC predictor — T.81 E.2.4
            if (!r.resync()) return None
            blocksUntilRestart = restartInterval
            dcPred = 0
          }
          bx += 1
        }
        by += 1
      }
      Some((width, height))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // Encoder: genuine baseline JFIF bytes for flat (DC-only) blocks.
  // ---------------------------------------------------------------

  // Encoder-side Huffman specs, written into DHT and used for the
  // scan — the DECODER builds its tables from the stream, so any
  // spec-conformant canonical table works; these are minimal ones
  // (the all-ones code of each max length stays unused, as the
  // 1-padding convention requires).
  private val EncDcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcVals = (0 to 11).map(_.toByte).toArray // categories 0..11, all 4-bit codes
  private val EncAcBits = Array(1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncAcVals = Array(0x00, 0x01, 0x11, 0xf0).map(_.toByte) // EOB first (1-bit code)

  private def canonicalCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += (vals(vi) & 0xff) -> ((code, l))
        code += 1; vi += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  /** Encode a genuine DC-only baseline grayscale JFIF payload:
    * `blockValue(blockIndex)` (row-major over the ceil(w/8) x
    * ceil(h/8) block grid) gives each flat 8x8 block's gray level
    * 0..255. Q(0,0) = 8, so the decoder's closed form reproduces the
    * block value EXACTLY (DC = value - 128, samples = DC*8/8 + 128).
    * The DC differences flow through the real category/EXTEND coding,
    * so multi-block images exercise the whole predictor chain.
    *
    * `restartInterval > 0` declares DRI and emits a real restart
    * sequence every that-many blocks (1-pad to the byte boundary,
    * FFD0+(n mod 8), DC predictor reset — T.81 E.2.4), which is what
    * the DRI round-trip specs decode back.
    */
  def encode(width: Int, height: Int, blockValue: Int => Int,
             restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    require(restartInterval >= 0, "restartInterval >= 0")
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    def segment(m: Int, body: Array[Byte]): Unit = {
      marker(m); w16(body.length + 2); bos.write(body)
    }
    marker(0xd8) // SOI
    segment(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    segment(0xdb, Array.tabulate[Byte](65)(i => if (i == 0) 0 else 8)) // DQT id 0, all 8
    segment(0xc0, { // SOF0: 8-bit, 1 component, 1x1 sampling, quant 0
      val b = new java.io.ByteArrayOutputStream()
      b.write(8); b.write(height >> 8); b.write(height & 0xff)
      b.write(width >> 8); b.write(width & 0xff)
      b.write(1); b.write(1); b.write(0x11); b.write(0)
      b.toByteArray
    })
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit =
      segment(0xc4, {
        val b = new java.io.ByteArrayOutputStream()
        b.write((tc << 4) | th); bits.foreach(b.write); b.write(vals, 0, vals.length)
        b.toByteArray
      })
    dht(0, 0, EncDcBits, EncDcVals) // DC class, table id 0
    dht(1, 1, EncAcBits, EncAcVals) // AC class, table id 1 (SOS Ta=1)
    if (restartInterval > 0)
      segment(0xdd, Array[Byte]((restartInterval >> 8).toByte,
        (restartInterval & 0xff).toByte)) // DRI
    segment(0xda, Array[Byte](1, 1, 0x01, 0, 63, 0)) // SOS: comp 1, DC 0 / AC 1
    // entropy-coded scan with MSB-first packing and FF-stuffing
    val dcCodes = canonicalCodes(EncDcBits, EncDcVals)
    val acCodes = canonicalCodes(EncAcBits, EncAcVals)
    var acc = 0L
    var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        w8(b)
        if (b == 0xff) w8(0x00)
        nbits -= 8
      }
    }
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    def padToByte(): Unit = if (nbits > 0) { // 1-pad to byte boundary
      val pad = 8 - nbits
      putBits((1 << pad) - 1, pad)
    }
    var pred = 0
    var blk = 0
    var rstN = 0
    while (blk < bw * bh) {
      val target = ((blockValue(blk) % 256) + 256) % 256
      val dc = target - 128
      val diff = dc - pred
      pred = dc
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, cl) = dcCodes(s)
      putBits(c, cl)
      if (s > 0) putBits(if (diff >= 0) diff else diff - 1 + (1 << s), s)
      val (e, el) = acCodes(0x00) // EOB: every AC coefficient is zero
      putBits(e, el)
      blk += 1
      if (restartInterval > 0 && blk % restartInterval == 0 && blk < bw * bh) {
        padToByte()
        marker(0xd0 + (rstN & 7)) // RSTn, cyclic modulo 8
        rstN += 1
        pred = 0
      }
    }
    padToByte()
    marker(0xd9) // EOI
    bos.toByteArray
  }
}
