package graft.multimodal

import graft.multimodal.PngCodec.PixelStats

/** Pure-JVM BASELINE JPEG decoder (ITU-T T.81 / ISO 10918-1, public
  * specification; JFIF container) — baseline needs no codec library
  * at all, so with this the declared multimodal pixel stub shrinks to
  * the learned feature encoder alone (SURVEY.md §6).
  *
  * The full entropy layer is real:
  *  - marker segment walk (SOI, APPn/COM skip, DQT quantization
  *    tables, DHT Huffman tables, DRI restart interval, SOF0, SOS);
  *  - canonical Huffman table construction from DHT BITS/HUFFVAL
  *    exactly as T.81 Annex C specifies (mincode/maxcode/valptr) —
  *    the decoder reads WHATEVER tables the stream declares, it has
  *    no tables of its own;
  *  - the entropy-coded scan: MSB-first bit unpacking with 0xFF00
  *    byte-unstuffing, RSTn restart handling (MCU-boundary resync +
  *    DC predictor reset), the DC difference chain (category code +
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
  * Decoder scope: 8-bit baseline (SOF0), grayscale (1 component,
  * 1x1 sampling) AND 3-component YCbCr color with 4:4:4, 4:2:2 or
  * 4:2:0 subsampling (interleaved scan, per-component DC predictors,
  * nearest-replication chroma upsampling); PLUS progressive (SOF2)
  * grayscale AND color at the SAME 4:4:4 / 4:2:2 / 4:2:0 sampling
  * matrix (r16 — T.81 Annex G spectral selection + successive
  * approximation, EOB runs, refinement correction bits, interleaved
  * DC scans over the MCU-aligned per-component coefficient grids).
  * The JPEG matrix is CLOSED. The YCbCr -> RGB
  * transform is the standard JFIF one in 16.16 FIXED-POINT integer
  * arithmetic (libjpeg-style constants: 1.402 -> 91881/65536 etc.),
  * so color reconstruction from DC-only streams is exact integer math
  * the parity oracle replays in SQL with no float drift.
  * Garbage-safe like the other codecs: malformed or truncated
  * payloads return None.
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

  /** Decode a baseline JPEG (grayscale or YCbCr color) to exact
    * integer aggregates — grayscale over the gray samples
    * (channels = 1), color over the interleaved RGB samples
    * (channels = 3, n_samples = 3wh). None for anything outside the
    * documented scope.
    */
  def decodeStats(bytes: Array[Byte]): Option[PixelStats] = {
    var sum = 0L
    var sumSq = 0L
    val gray = decodeBlocks(bytes, (_, _) => ()) { (_, _, nx, ny, flat, px) =>
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
    gray.orElse {
      sum = 0L
      sumSq = 0L
      decodeColorPixels(bytes) { (_, _, r, g, b) =>
        sum += r.toLong + g + b
        sumSq += r.toLong * r + g.toLong * g + b.toLong * b
      }.map { case (w, h) =>
        PixelStats(w, h, 3, 3L * w * h, sum, sumSq)
      }
    }.orElse { // progressive (SOF2): ONE entropy decode, then dispatch
      // on component count (gray block walk vs color pixel walk)
      decodeProgressiveCoefs(bytes).flatMap { fr =>
        sum = 0L
        sumSq = 0L
        if (fr.coefs.length == 1) {
          decodeProgressiveBlocks(fr, (_, _) => ()) { (_, _, nx, ny, flat, px) =>
            if (px == null) {
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
        } else {
          decodeProgressiveColorPixels(fr) { (_, _, r, g, b) =>
            sum += r.toLong + g + b
            sumSq += r.toLong * r + g.toLong * g + b.toLong * b
          }.map { case (w, h) =>
            PixelStats(w, h, 3, 3L * w * h, sum, sumSq)
          }
        }
      }
    }
  }

  /** Full decoded raster (row-major), for spec-side pixel comparison
    * against the independent forward-DCT test encoder.
    */
  private[graft] def decodeRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var out: Array[Int] = null
    var w0 = 0
    def fill(bx: Int, by: Int, nx: Int, ny: Int, flat: Int,
             px: Array[Int]): Unit = {
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
    }
    decodeBlocks(bytes,
        (w, h) => { w0 = w; out = new Array[Int](w * h) })(fill)
      .orElse(decodeProgressiveBlocks(bytes,
        (w, h) => { w0 = w; out = new Array[Int](w * h) })(fill))
      .map { case (w, h) => (w, h, out) }
  }

  // ---------------------------------------------------------------
  // Progressive (SOF2) grayscale decode — T.81 Annex G: spectral
  // selection (each scan carries a zigzag band [Ss..Se]) + successive
  // approximation (first scans deliver coefficients at precision
  // >> Al; refinement scans append one magnitude bit each). The
  // entropy primitives (canonical Huffman, EXTEND, bit reader with
  // FF00 unstuffing and RSTn handling) are the baseline machinery
  // above; what progressive adds is the per-image coefficient buffer
  // (inherent to the format — scans revisit every block) and the
  // first/refinement band decoders, written to the spec's G.1.2
  // procedures (EOB runs shared across blocks, correction bits for
  // already-nonzero history during refinement — including inside EOB
  // runs). Scope: 8-bit, grayscale AND 3-component color at
  // 4:4:4 / 4:2:2 / 4:2:0 (the full baseline sampling matrix —
  // interleaved DC scans walk MCUs, AC scans walk each component's
  // non-interleaved sub-grid per A.2.2). Reconstruction reuses
  // the baseline paths bit-for-bit: DC-only blocks keep the exact
  // integer closed form (so the SAME oracle arithmetic gates both
  // framings), AC blocks go through the shared dequant + IDCT.
  // ---------------------------------------------------------------

  /** One INTERLEAVED DC scan (first or refinement) over the MCU grid
    * (T.81 allows multi-component DC scans; AC scans are always
    * single-component): each MCU holds h_i × v_i blocks per scan
    * component in sampling order, addressed into the component's
    * INTERLEAVED block grid (stride `scanBwI`, which includes the
    * MCU-alignment padding blocks — the differential-DC chain runs
    * through them). Per-component predictors; restart counted in
    * MCUs. Returns position after the scan or -1.
    */
  private def decodeProgDcScan(bytes: Array[Byte], scanStart: Int,
      scanCoefs: Array[Array[Int]], scanDcTs: Array[HuffTable],
      scanH: Array[Int], scanV: Array[Int], scanBwI: Array[Int],
      mcus: Int, mcusX: Int, ah: Int, al: Int, ri: Int): Int = {
    val r = new BitReader(bytes, scanStart)
    val preds = new Array[Int](scanCoefs.length)
    var until = if (ri > 0) ri else Int.MaxValue
    var m = 0
    while (m < mcus) {
      val mx = m % mcusX
      val my = m / mcusX
      var ci = 0
      while (ci < scanCoefs.length) {
        var vy = 0
        while (vy < scanV(ci)) {
          var vx = 0
          while (vx < scanH(ci)) {
            val base = ((my * scanV(ci) + vy) * scanBwI(ci) +
              (mx * scanH(ci) + vx)) * 64
            if (ah == 0) { // DC first: category + EXTEND diff, shifted
              val s = decodeHuff(r, scanDcTs(ci))
              if (s < 0 || s > 11) return -1
              val dBits = if (s == 0) 0 else r.bits(s)
              if (dBits < 0) return -1
              preds(ci) += extend(dBits, s)
              scanCoefs(ci)(base) = preds(ci) << al
            } else { // DC refinement: one bit per block per component
              val bit = r.bit()
              if (bit < 0) return -1
              if (bit == 1) scanCoefs(ci)(base) |= (1 << al)
            }
            vx += 1
          }
          vy += 1
        }
        ci += 1
      }
      until -= 1
      if (until == 0 && m != mcus - 1) {
        if (!r.resync()) return -1
        until = ri
        java.util.Arrays.fill(preds, 0)
      }
      m += 1
    }
    r.pos
  }

  /** One NON-interleaved DC scan (ns = 1): the component's own
    * bwN × bhN block sub-grid in raster order, addressed into the
    * interleaved buffer (stride bwI). Restart counted in blocks.
    */
  private def decodeProgDcScanNI(bytes: Array[Byte], scanStart: Int,
      coefs: Array[Int], dcT: HuffTable, bwN: Int, bhN: Int, bwI: Int,
      ah: Int, al: Int, ri: Int): Int = {
    val r = new BitReader(bytes, scanStart)
    var pred = 0
    var until = if (ri > 0) ri else Int.MaxValue
    val nBlocks = bwN * bhN
    var b = 0
    while (b < nBlocks) {
      val base = ((b / bwN) * bwI + (b % bwN)) * 64
      if (ah == 0) {
        val s = decodeHuff(r, dcT)
        if (s < 0 || s > 11) return -1
        val dBits = if (s == 0) 0 else r.bits(s)
        if (dBits < 0) return -1
        pred += extend(dBits, s)
        coefs(base) = pred << al
      } else {
        val bit = r.bit()
        if (bit < 0) return -1
        if (bit == 1) coefs(base) |= (1 << al)
      }
      until -= 1
      if (until == 0 && b != nBlocks - 1) {
        if (!r.resync()) return -1
        until = ri
        pred = 0
      }
      b += 1
    }
    r.pos
  }

  /** One AC scan (single component by T.81) over the component's own
    * bwN × bhN block sub-grid in raster order, addressed into the
    * interleaved buffer (stride bwI — MCU padding blocks carry no AC,
    * which is the spec's non-interleaved dimension rule and also why
    * they can only ever be DC-flat). Returns position after the scan
    * or -1.
    */
  private def decodeProgAcScan(bytes: Array[Byte], scanStart: Int,
      coefs: Array[Int], bwN: Int, bhN: Int, bwI: Int, acT: HuffTable,
      ss: Int, se: Int, ah: Int, al: Int, ri: Int): Int = {
    val r = new BitReader(bytes, scanStart)
    var eobrun = 0
    var until = if (ri > 0) ri else Int.MaxValue
    val nBlocks = bwN * bhN
    var b = 0
    while (b < nBlocks) {
      val base = ((b / bwN) * bwI + (b % bwN)) * 64
      if (ah == 0) { // AC first (G.1.2.2)
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var brk = false
          while (!brk && k <= se) {
            val rs = decodeHuff(r, acT)
            if (rs < 0) return -1
            val run = rs >> 4
            val s = rs & 15
            if (s == 0) {
              if (run == 15) k += 16 // ZRL
              else { // EOBn: run extra bits, counts THIS block
                eobrun = (1 << run) - 1
                if (run > 0) {
                  val eb = r.bits(run)
                  if (eb < 0) return -1
                  eobrun += eb
                }
                brk = true
              }
            } else {
              k += run
              if (k > se) return -1
              val v = r.bits(s)
              if (v < 0) return -1
              coefs(base + k) = extend(v, s) << al
              k += 1
            }
          }
        }
      } else { // AC refinement (G.1.2.3)
        val p1 = 1 << al
        val m1 = -(1 << al)
        // append one correction bit to an already-nonzero coefficient
        def correct(idx: Int): Boolean = {
          val c = coefs(idx)
          val cb = r.bit()
          if (cb < 0) return false
          if (cb == 1 && (c & p1) == 0)
            coefs(idx) = c + (if (c >= 0) p1 else m1)
          true
        }
        var k = ss
        if (eobrun == 0) {
          var brk = false
          while (!brk && k <= se) {
            val rs = decodeHuff(r, acT)
            if (rs < 0) return -1
            var run = rs >> 4
            val s = rs & 15
            var newVal = 0
            if (s != 0) {
              if (s != 1) return -1 // refinement codes only ±1<<Al
              val sb = r.bit()
              if (sb < 0) return -1
              newVal = if (sb == 1) p1 else m1
            } else if (run != 15) { // EOBn
              eobrun = 1 << run
              if (run > 0) {
                val eb = r.bits(run)
                if (eb < 0) return -1
                eobrun += eb
              }
              brk = true
            } // run == 15, s == 0: ZRL — skip 16 zero-HISTORY slots
            if (!brk) {
              // advance: correction bits at nonzero-history positions
              // (they don't consume the run), place the new value at
              // the (run+1)-th zero-history position
              var placed = false
              while (!placed && k <= se) {
                if (coefs(base + k) != 0) {
                  if (!correct(base + k)) return -1
                } else if (run == 0) {
                  if (newVal != 0) coefs(base + k) = newVal
                  placed = true
                } else run -= 1
                if (!placed) k += 1
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          // blocks inside an EOB run still carry correction bits for
          // every remaining nonzero-history coefficient of the band
          while (k <= se) {
            if (coefs(base + k) != 0 && !correct(base + k)) return -1
            k += 1
          }
          eobrun -= 1
        }
      }
      until -= 1
      if (until == 0 && b != nBlocks - 1) {
        if (!r.resync()) return -1
        until = ri
        eobrun = 0
      }
      b += 1
    }
    r.pos
  }

  /** Parse and entropy-decode ALL scans of a progressive (SOF2)
    * stream over the SAME sampling family as the baseline decoder —
    * grayscale, or 3-component color at 4:4:4 / 4:2:2 / 4:2:0 (luma
    * factors in {1,2}, chroma 1x1). Coefficient buffers live on each
    * component's INTERLEAVED (MCU-aligned) block grid; interleaved DC
    * scans walk MCUs with h×v luma blocks each, single-component
    * scans (all AC scans, and ns=1 DC scans) walk the component's own
    * non-interleaved sub-grid per T.81 A.2.2. None for anything out
    * of scope or malformed.
    */
  private def decodeProgressiveCoefs(bytes: Array[Byte]): Option[ProgFrame] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = 0
    var height = 0
    var restartInterval = 0
    var nc = 0
    var compIds: Array[Int] = null
    var compTq: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var coefs: Array[Array[Int]] = null
    var mcusX = 0
    var mcusY = 0
    var bwI: Array[Int] = null
    var bhI: Array[Int] = null
    var bwN: Array[Int] = null
    var bhN: Array[Int] = null
    var sawScan = false
    var pos = 2
    try {
      var done = false
      while (!done) {
        if (pos + 1 >= bytes.length) return None
        if ((bytes(pos) & 0xff) != 0xff) return None
        var marker = bytes(pos + 1) & 0xff
        pos += 2
        while (marker == 0xff) {
          if (pos >= bytes.length) return None
          marker = bytes(pos) & 0xff; pos += 1
        }
        marker match {
          case 0xd9 => done = true // EOI
          case m if m >= 0xd0 && m <= 0xd7 => // stray RST: skip
          case _ =>
            if (pos + 1 >= bytes.length) return None
            val len = be16(bytes, pos)
            if (len < 2 || pos + len > bytes.length) return None
            val end = pos + len
            var p = pos + 2
            marker match {
              case 0xc2 => // SOF2 progressive
                if (coefs != null) return None // one frame only
                val precision = bytes(p) & 0xff
                height = be16(bytes, p + 1)
                width = be16(bytes, p + 3)
                nc = bytes(p + 5) & 0xff
                if (precision != 8 || (nc != 1 && nc != 3)) return None
                if (width <= 0 || height <= 0 ||
                  width.toLong * height > MaxPixels) return None
                compIds = new Array[Int](nc)
                compTq = new Array[Int](nc)
                compH = new Array[Int](nc)
                compV = new Array[Int](nc)
                var ci = 0
                var q = p + 6
                while (ci < nc) {
                  compIds(ci) = bytes(q) & 0xff
                  val hv = bytes(q + 1) & 0xff
                  compH(ci) = hv >> 4
                  compV(ci) = hv & 0x0f
                  compTq(ci) = bytes(q + 2) & 0x0f
                  q += 3
                  ci += 1
                }
                // same sampling family as baseline: gray 1x1, or luma
                // factors in {1,2} with chroma 1x1 (4:4:4/4:2:2/4:2:0)
                if (nc == 1) {
                  if (compH(0) != 1 || compV(0) != 1) return None
                } else {
                  if (compH(0) < 1 || compH(0) > 2 ||
                    compV(0) < 1 || compV(0) > 2) return None
                  if (compH(1) != 1 || compV(1) != 1 ||
                    compH(2) != 1 || compV(2) != 1) return None
                }
                val hMax = compH.max
                val vMax = compV.max
                mcusX = (width + 8 * hMax - 1) / (8 * hMax)
                mcusY = (height + 8 * vMax - 1) / (8 * vMax)
                // per component: INTERLEAVED grid (MCU-aligned, holds
                // the padding blocks the DC chain runs through) and
                // the NON-interleaved sub-grid AC/single-comp scans use
                bwI = Array.tabulate(nc)(i => mcusX * compH(i))
                bhI = Array.tabulate(nc)(i => mcusY * compV(i))
                bwN = Array.tabulate(nc) { i =>
                  val cw = (width * compH(i) + hMax - 1) / hMax
                  (cw + 7) / 8
                }
                bhN = Array.tabulate(nc) { i =>
                  val chh = (height * compV(i) + vMax - 1) / vMax
                  (chh + 7) / 8
                }
                coefs = Array.tabulate(nc)(i =>
                  new Array[Int](bwI(i) * bhI(i) * 64))
              case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                   0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
                return None // any other frame type
              case 0xdb =>
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
              case 0xc4 =>
                while (p < end) {
                  val tc = (bytes(p) & 0xff) >> 4
                  val th = bytes(p) & 0x0f
                  p += 1
                  if (th > 3 || tc > 1) return None
                  val bits = new Array[Int](16)
                  var total = 0
                  var i = 0
                  while (i < 16) {
                    bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1
                  }
                  p += 16
                  if (total > 256 || p + total > end) return None
                  val vals = java.util.Arrays.copyOfRange(bytes, p, p + total)
                  p += total
                  val t = new HuffTable(bits, vals)
                  if (tc == 0) dcTabs(th) = t else acTabs(th) = t
                }
              case 0xdd => restartInterval = be16(bytes, p)
              case 0xda => // SOS: one scan of the progression
                if (coefs == null) return None
                val ns = bytes(p) & 0xff
                if (ns < 1 || ns > nc) return None
                val scanComp = new Array[Int](ns)
                val scanTd = new Array[Int](ns)
                val scanTa = new Array[Int](ns)
                var si = 0
                var q = p + 1
                while (si < ns) {
                  val cs = bytes(q) & 0xff
                  val idx = compIds.indexOf(cs)
                  if (idx < 0) return None
                  scanComp(si) = idx
                  scanTd(si) = (bytes(q + 1) & 0xff) >> 4
                  scanTa(si) = bytes(q + 1) & 0x0f
                  q += 2
                  si += 1
                }
                if (scanComp.distinct.length != ns) return None
                val scanSs = bytes(q) & 0xff
                val scanSe = bytes(q + 1) & 0xff
                val aa = bytes(q + 2) & 0xff
                val scanAh = aa >> 4
                val scanAl = aa & 0x0f
                if (scanSs > 63 || scanSe > 63 || scanSs > scanSe) return None
                if ((scanSs == 0) != (scanSe == 0)) return None // DC is 0..0
                if (scanAl > 13 || scanAh > 13) return None
                if (scanAh != 0 && scanAh != scanAl + 1) return None
                val after =
                  if (scanSs == 0 && ns > 1) {
                    // interleaved DC scan; the table is only read in
                    // FIRST scans (refinement is raw bits)
                    val dcTs = scanTd.map { t =>
                      if (dcTabs(t) != null) dcTabs(t)
                      else if (scanAh == 0) return None
                      else new HuffTable(new Array[Int](16),
                        Array.emptyByteArray)
                    }
                    decodeProgDcScan(bytes, end,
                      scanComp.map(coefs(_)), dcTs,
                      scanComp.map(compH(_)), scanComp.map(compV(_)),
                      scanComp.map(bwI(_)), mcusX * mcusY, mcusX,
                      scanAh, scanAl, restartInterval)
                  } else if (scanSs == 0) {
                    // single-component DC scan: the comp's own sub-grid
                    val c0 = scanComp(0)
                    if (scanAh == 0 && dcTabs(scanTd(0)) == null) return None
                    val dcT = if (dcTabs(scanTd(0)) != null) dcTabs(scanTd(0))
                      else new HuffTable(new Array[Int](16),
                        Array.emptyByteArray)
                    decodeProgDcScanNI(bytes, end, coefs(c0), dcT,
                      bwN(c0), bhN(c0), bwI(c0),
                      scanAh, scanAl, restartInterval)
                  } else {
                    if (ns != 1) return None // AC scans: one component
                    if (acTabs(scanTa(0)) == null) return None
                    val c0 = scanComp(0)
                    decodeProgAcScan(bytes, end, coefs(c0),
                      bwN(c0), bhN(c0), bwI(c0), acTabs(scanTa(0)),
                      scanSs, scanSe, scanAh, scanAl, restartInterval)
                  }
                if (after < 0) return None
                sawScan = true
                pos = after
              case _ => // APPn, COM: skip
            }
            if (marker != 0xda) pos = end
        }
      }
      if (coefs == null || !sawScan) return None
      val qts = compTq.map { t =>
        if (quant(t) == null) return None
        quant(t)
      }
      Some(ProgFrame(width, height, compH, compV, bwI, coefs, qts))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** A fully entropy-decoded progressive frame: per-component zigzag
    * coefficient buffers on the INTERLEAVED block grid (stride bwI)
    * plus the sampling geometry reconstruction needs.
    */
  private final case class ProgFrame(width: Int, height: Int,
      compH: Array[Int], compV: Array[Int], bwI: Array[Int],
      coefs: Array[Array[Int]], qts: Array[Array[Int]])

  /** Reconstruct one component's block: null raster means the exact
    * DC-only closed form (flat value returned alongside) — the SAME
    * two paths the baseline decoder takes.
    */
  private def progBlock(coefs: Array[Int], base: Int,
                        qt: Array[Int]): (Int, Array[Int]) = {
    var anyAc = false
    var k = 1
    while (k < 64) {
      if (coefs(base + k) != 0) anyAc = true
      k += 1
    }
    if (!anyAc) {
      val x = 128 + Math.round(coefs(base).toDouble * qt(0) / 8.0).toInt
      (if (x < 0) 0 else if (x > 255) 255 else x, null)
    } else {
      val nat = new Array[Int](64)
      k = 0
      while (k < 64) {
        nat(ZigZag(k)) = coefs(base + k) * qt(k)
        k += 1
      }
      (0, idctBlock(nat))
    }
  }

  /** Progressive grayscale decode to the SAME onDims/onBlock shape as
    * [[decodeBlocks]] — the stats and raster consumers are shared.
    * None for malformed input, progressive color, or any scope gate.
    */
  private def decodeProgressiveBlocks(bytes: Array[Byte],
      onDims: (Int, Int) => Unit)(
      onBlock: (Int, Int, Int, Int, Int, Array[Int]) => Unit): Option[(Int, Int)] = {
    val f = decodeProgressiveCoefs(bytes) match {
      case Some(t) => t
      case None => return None
    }
    decodeProgressiveBlocks(f, onDims)(onBlock)
  }

  /** ProgFrame overload — same single-entropy-decode rationale as the
    * color one.
    */
  private def decodeProgressiveBlocks(f: ProgFrame,
      onDims: (Int, Int) => Unit)(
      onBlock: (Int, Int, Int, Int, Int, Array[Int]) => Unit): Option[(Int, Int)] = {
    if (f.coefs.length != 1) return None
    val width = f.width
    val height = f.height
    onDims(width, height)
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val (flat, px) = progBlock(f.coefs(0), (by * f.bwI(0) + bx) * 64,
          f.qts(0))
        val nx = math.min(8, width - bx * 8)
        val ny = math.min(8, height - by * 8)
        onBlock(bx, by, nx, ny, flat, px)
        bx += 1
      }
      by += 1
    }
    Some((width, height))
  }

  /** Progressive color decode to the SAME onPixel shape as
    * [[decodeColorPixels]]: per MCU each component's h×v blocks
    * reconstruct independently (DC-only closed form or shared IDCT),
    * then every in-image pixel samples through the SAME
    * nearest-replication upsample + fixed-point YCbCr → RGB transform
    * as the baseline color path. None for grayscale streams.
    */
  private def decodeProgressiveColorPixels(bytes: Array[Byte])(
      onPixel: (Int, Int, Int, Int, Int) => Unit): Option[(Int, Int)] = {
    val fr = decodeProgressiveCoefs(bytes) match {
      case Some(t) => t
      case None => return None
    }
    decodeProgressiveColorPixels(fr)(onPixel)
  }

  /** ProgFrame overload: callers that already ran
    * [[decodeProgressiveCoefs]] (to dispatch on component count or
    * size a buffer) reconstruct from the decoded coefficients without
    * paying the entropy decode a second time.
    */
  private def decodeProgressiveColorPixels(fr: ProgFrame)(
      onPixel: (Int, Int, Int, Int, Int) => Unit): Option[(Int, Int)] = {
    if (fr.coefs.length != 3) return None
    val width = fr.width
    val height = fr.height
    val hMax = fr.compH.max
    val vMax = fr.compV.max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    val flat = Array.ofDim[Int](3, hMax * vMax)
    val rast = Array.ofDim[Array[Int]](3, hMax * vMax)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var ci = 0
        while (ci < 3) {
          val h = fr.compH(ci)
          val v = fr.compV(ci)
          var vy = 0
          while (vy < v) {
            var vx = 0
            while (vx < h) {
              val base = ((my * v + vy) * fr.bwI(ci) + (mx * h + vx)) * 64
              val (fv, px) = progBlock(fr.coefs(ci), base, fr.qts(ci))
              flat(ci)(vy * h + vx) = fv
              rast(ci)(vy * h + vx) = px
              vx += 1
            }
            vy += 1
          }
          ci += 1
        }
        val x0 = mx * mcuW
        val y0 = my * mcuH
        var py = 0
        while (py < mcuH && y0 + py < height) {
          var px = 0
          while (px < mcuW && x0 + px < width) {
            def sample(ci: Int): Int = {
              val cx = px * fr.compH(ci) / hMax
              val cy = py * fr.compV(ci) / vMax
              val bj = (cy / 8) * fr.compH(ci) + (cx / 8)
              val ra = rast(ci)(bj)
              if (ra == null) flat(ci)(bj)
              else ra((cy % 8) * 8 + (cx % 8))
            }
            val (rr, gg, bb) = ycbcrToRgb(sample(0), sample(1), sample(2))
            onPixel(x0 + px, y0 + py, rr, gg, bb)
            px += 1
          }
          py += 1
        }
        mx += 1
      }
      my += 1
    }
    Some((width, height))
  }

  /** One scan component: SOF sampling factors + quant table id, SOS
    * entropy table ids (filled at SOS time).
    */
  private final class Comp(val h: Int, val v: Int, val tq: Int) {
    var td = 0
    var ta = 0
  }

  /** Everything the marker walk yields up to (and including) SOS. */
  private final class Hdr(val width: Int, val height: Int,
                          val quant: Array[Array[Int]],
                          val dcTabs: Array[HuffTable],
                          val acTabs: Array[HuffTable],
                          val comps: Array[Comp],
                          val restartInterval: Int,
                          val scanStart: Int)

  /** Marker segment walk (SOI .. SOS): DQT/DHT/DRI/SOF0 into an
    * [[Hdr]]. Scope gate lives here: 8-bit baseline, 1 component at
    * 1x1, or 3 components with chroma 1x1 and luma factors in {1,2}
    * (4:4:4 / 4:2:2 / 4:2:0). None for anything else or malformed.
    */
  private def parseHeaders(bytes: Array[Byte]): Option[Hdr] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    var restartInterval = 0
    var pos = 2
    try {
      while (true) {
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
                if (precision != 8 || (nc != 1 && nc != 3)) return None
                if (width <= 0 || height <= 0 ||
                  width.toLong * height > MaxPixels) return None
                comps = new Array[Comp](nc)
                var ci = 0
                var q = p + 6
                while (ci < nc) {
                  val hv = bytes(q + 1) & 0xff
                  val ch = hv >> 4
                  val cv = hv & 0x0f
                  comps(ci) = new Comp(ch, cv, bytes(q + 2) & 0x0f)
                  q += 3
                  ci += 1
                }
                if (nc == 1) {
                  if (comps(0).h != 1 || comps(0).v != 1) return None
                } else {
                  // luma in {1,2} each axis, chroma strictly 1x1:
                  // 4:4:4, 4:2:2 and 4:2:0 — the baseline family
                  if (comps(0).h < 1 || comps(0).h > 2 ||
                    comps(0).v < 1 || comps(0).v > 2) return None
                  if (comps(1).h != 1 || comps(1).v != 1 ||
                    comps(2).h != 1 || comps(2).v != 1) return None
                }
              case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                   0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
                return None // non-baseline SOF
              case 0xdd => // DRI
                restartInterval = be16(bytes, p)
              case 0xda => // SOS
                if (comps == null) return None
                val ns = bytes(p) & 0xff
                if (ns != comps.length) return None
                var ci = 0
                var q = p + 1
                while (ci < ns) { // component-selector order == SOF order
                  comps(ci).td = (bytes(q + 1) & 0xff) >> 4
                  comps(ci).ta = bytes(q + 1) & 0x0f
                  q += 2
                  ci += 1
                }
                for (c <- comps)
                  if (quant(c.tq) == null || dcTabs(c.td) == null ||
                    acTabs(c.ta) == null) return None
                return Some(new Hdr(width, height, quant, dcTabs, acTabs,
                  comps, restartInterval, end))
              case _ => // APPn, COM, anything else: skip
            }
            pos = end
        }
      }
      None
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Decode one 8x8 block through the shared DC + AC entropy layer.
    * Returns null on malformed data; otherwise (newDcPred, flatValue,
    * raster) where raster == null marks the DC-only closed form
    * (flatValue is the exact integer sample for all 64 positions).
    */
  private def decodeBlock(r: BitReader, dcT: HuffTable, acT: HuffTable,
                          qt: Array[Int], pred: Int): (Int, Int, Array[Int]) = {
    // DC: category + EXTEND, differential vs previous block
    val s = decodeHuff(r, dcT)
    if (s < 0 || s > 11) return null
    val diffBits = if (s == 0) 0 else r.bits(s)
    if (diffBits < 0) return null
    val dc = pred + extend(diffBits, s)
    // AC: run/size symbols in zigzag order, dequantized into the
    // natural-order coefficient block
    val coef = new Array[Int](64)
    var anyAc = false
    var k = 1
    var eob = false
    while (!eob && k <= 63) {
      val rs = decodeHuff(r, acT)
      if (rs < 0) return null
      if (rs == 0x00) eob = true
      else if (rs == 0xf0) k += 16 // ZRL: sixteen zeros
      else {
        val run = rs >> 4
        val size = rs & 0x0f
        val v = r.bits(size)
        if (v < 0) return null
        k += run
        if (k > 63) return null
        val ac = extend(v, size)
        if (ac != 0) {
          coef(ZigZag(k)) = ac * qt(k) // quant table is zigzag-ordered
          anyAc = true
        }
        k += 1
      }
    }
    if (!anyAc) {
      // DC-only IDCT closed form: all 64 samples = DC*Q00/8+128
      // — exact integer arithmetic, the oracle-gated path
      val x = 128 + Math.round(dc.toDouble * qt(0) / 8.0).toInt
      val v = if (x < 0) 0 else if (x > 255) 255 else x
      (dc, v, null)
    } else {
      // the general baseline path: full dequant + 2-D IDCT
      coef(0) = dc * qt(0)
      (dc, 0, idctBlock(coef))
    }
  }

  /** Grayscale entropy-decode core. `onDims` fires once after the
    * headers parse (before any block); `onBlock` receives, per block,
    * its grid position, the in-image sample window (nx, ny), and
    * EITHER a flat DC-only value (px == null) or the 8x8 IDCT raster.
    * Returns the image dims; None for malformed input or a color
    * stream (see [[decodeColorPixels]]).
    */
  private def decodeBlocks(bytes: Array[Byte], onDims: (Int, Int) => Unit)(
      onBlock: (Int, Int, Int, Int, Int, Array[Int]) => Unit): Option[(Int, Int)] = {
    val hdr = parseHeaders(bytes).getOrElse(return None)
    if (hdr.comps.length != 1) return None
    val c0 = hdr.comps(0)
    val qt = hdr.quant(c0.tq) // zigzag-ordered, per DQT
    val dcT = hdr.dcTabs(c0.td)
    val acT = hdr.acTabs(c0.ta)
    val width = hdr.width
    val height = hdr.height
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    onDims(width, height)
    try {
      val r = new BitReader(bytes, hdr.scanStart)
      var dcPred = 0
      var blocksUntilRestart =
        if (hdr.restartInterval > 0) hdr.restartInterval else Int.MaxValue
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val blk = decodeBlock(r, dcT, acT, qt, dcPred)
          if (blk == null) return None
          dcPred = blk._1
          val nx = math.min(8, width - bx * 8)
          val ny = math.min(8, height - by * 8)
          if (blk._3 == null) onBlock(bx, by, nx, ny, blk._2, null)
          else onBlock(bx, by, nx, ny, 0, blk._3)
          blocksUntilRestart -= 1
          val lastBlock = bx == bw - 1 && by == bh - 1
          if (blocksUntilRestart == 0 && !lastBlock) {
            // interval boundary: drop pad bits, consume RSTn, reset
            // the DC predictor — T.81 E.2.4
            if (!r.resync()) return None
            blocksUntilRestart = hdr.restartInterval
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

  // 16.16 fixed-point JFIF YCbCr -> RGB (libjpeg-style constants:
  // 1.402, 0.344136, 0.714136, 1.772 scaled by 65536). The +32768 is
  // the rounding half; the BIAS keeps the dividend positive so plain
  // integer division IS floor division — the same expression is
  // integer-exact in SQL, which is what the color parity twin relies
  // on.
  private val FixBias = 131072L * 65536L

  private def clamp8(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  private def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val r = clamp8((65536L * y + 91881L * (cr - 128) + 32768L + FixBias) / 65536L - 131072L)
    val g = clamp8((65536L * y - 22554L * (cb - 128) - 46802L * (cr - 128) + 32768L + FixBias) / 65536L - 131072L)
    val b = clamp8((65536L * y + 116130L * (cb - 128) + 32768L + FixBias) / 65536L - 131072L)
    (r, g, b)
  }

  /** Color (3-component YCbCr) entropy-decode core: interleaved MCUs
    * in SOF component order, per-component DC predictors, restart
    * intervals counted in MCUs, nearest-replication chroma
    * upsampling, fixed-point color transform. `onPixel` receives
    * every in-image pixel's (x, y, r, g, b) in MCU-scan order.
    * Returns the dims; None for malformed input or a grayscale
    * stream.
    */
  private def decodeColorPixels(bytes: Array[Byte])(
      onPixel: (Int, Int, Int, Int, Int) => Unit): Option[(Int, Int)] = {
    val hdr = parseHeaders(bytes).getOrElse(return None)
    if (hdr.comps.length != 3) return None
    val width = hdr.width
    val height = hdr.height
    val comps = hdr.comps
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    try {
      val r = new BitReader(bytes, hdr.scanStart)
      val preds = new Array[Int](3)
      // per component, h*v decoded blocks per MCU: (flat, rasterOrNull)
      val flat = Array.ofDim[Int](3, hMax * vMax)
      val rast = Array.ofDim[Array[Int]](3, hMax * vMax)
      var mcusUntilRestart =
        if (hdr.restartInterval > 0) hdr.restartInterval else Int.MaxValue
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var ci = 0
          while (ci < 3) {
            val c = comps(ci)
            val qt = hdr.quant(c.tq)
            val dcT = hdr.dcTabs(c.td)
            val acT = hdr.acTabs(c.ta)
            var vy = 0
            while (vy < c.v) {
              var vx = 0
              while (vx < c.h) {
                val blk = decodeBlock(r, dcT, acT, qt, preds(ci))
                if (blk == null) return None
                preds(ci) = blk._1
                flat(ci)(vy * c.h + vx) = blk._2
                rast(ci)(vy * c.h + vx) = blk._3
                vx += 1
              }
              vy += 1
            }
            ci += 1
          }
          // emit the MCU's in-image pixels through upsample + color
          // transform
          val x0 = mx * mcuW
          val y0 = my * mcuH
          var py = 0
          while (py < mcuH && y0 + py < height) {
            var px = 0
            while (px < mcuW && x0 + px < width) {
              def sample(ci: Int): Int = {
                val c = comps(ci)
                val cx = px * c.h / hMax // nearest-replication downscale
                val cy = py * c.v / vMax
                val bj = (cy / 8) * c.h + (cx / 8)
                val ra = rast(ci)(bj)
                if (ra == null) flat(ci)(bj)
                else ra((cy % 8) * 8 + (cx % 8))
              }
              val (rr, gg, bb) = ycbcrToRgb(sample(0), sample(1), sample(2))
              onPixel(x0 + px, y0 + py, rr, gg, bb)
              px += 1
            }
            py += 1
          }
          mcusUntilRestart -= 1
          val lastMcu = mx == mcusX - 1 && my == mcusY - 1
          if (mcusUntilRestart == 0 && !lastMcu) {
            if (!r.resync()) return None
            mcusUntilRestart = hdr.restartInterval
            var i = 0
            while (i < 3) { preds(i) = 0; i += 1 }
          }
          mx += 1
        }
        my += 1
      }
      Some((width, height))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Full decoded RGB raster (row-major, interleaved r,g,b), for
    * spec-side comparison against closed-form expectations.
    */
  private[graft] def decodeColorRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var out: Array[Int] = null
    var w0 = 0
    val dims = parseHeaders(bytes).filter(_.comps.length == 3).map { h =>
      w0 = h.width; out = new Array[Int](h.width * h.height * 3)
    }
    if (dims.isEmpty) {
      // progressive color: same raster through the SOF2 path
      return decodeProgressiveCoefs(bytes)
        .filter(_.coefs.length == 3)
        .flatMap { fr =>
          w0 = fr.width
          out = new Array[Int](fr.width * fr.height * 3)
          decodeProgressiveColorPixels(fr) { (x, y, r, g, b) =>
            val i = (y * w0 + x) * 3
            out(i) = r; out(i + 1) = g; out(i + 2) = b
          }.map { case (ww, hh) => (ww, hh, out) }
        }
    }
    decodeColorPixels(bytes) { (x, y, r, g, b) =>
      val i = (y * w0 + x) * 3
      out(i) = r; out(i + 1) = g; out(i + 2) = b
    }.map { case (w, h) => (w, h, out) }
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

  /** Encode a genuine DC-only baseline COLOR (3-component YCbCr)
    * JFIF payload. Per-plane flat 8x8 block values come from the
    * index functions over each plane's PADDED block grid:
    *
    *  - 4:4:4 (`subsample420 = false`): one MCU = one block per
    *    component; all three functions are indexed by the MCU index,
    *    row-major over ceil(w/8) x ceil(h/8).
    *  - 4:2:0 (`subsample420 = true`): one MCU = four Y blocks + Cb +
    *    Cr; `yBlock` is indexed row-major over the padded Y grid
    *    (2*ceil(w/16) columns x 2*ceil(h/16) rows), `cbBlock` /
    *    `crBlock` by the MCU index over ceil(w/16) x ceil(h/16) —
    *    each chroma value covers its whole 16x16 MCU.
    *
    * Q(0,0) = 8 so each decoded component sample equals its block
    * value exactly (the grayscale closed form, per plane); the RGB
    * the decoder emits is then the exact fixed-point transform of
    * those values — closed-form replayable with no codec and no
    * floats, which is what the color parity oracle does.
    * `restartInterval` > 0 declares DRI and restarts every that-many
    * MCUs (all three DC predictors reset).
    */
  def encodeColor(width: Int, height: Int,
                  yBlock: Int => Int, cbBlock: Int => Int, crBlock: Int => Int,
                  subsample420: Boolean,
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
    val yhv = if (subsample420) 0x22 else 0x11
    marker(0xd8) // SOI
    segment(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    segment(0xdb, Array.tabulate[Byte](65)(i => if (i == 0) 0 else 8)) // DQT id 0, all 8
    segment(0xc0, { // SOF0: 8-bit, 3 components, shared quant 0
      val b = new java.io.ByteArrayOutputStream()
      b.write(8); b.write(height >> 8); b.write(height & 0xff)
      b.write(width >> 8); b.write(width & 0xff)
      b.write(3)
      b.write(1); b.write(yhv); b.write(0)  // Y
      b.write(2); b.write(0x11); b.write(0) // Cb
      b.write(3); b.write(0x11); b.write(0) // Cr
      b.toByteArray
    })
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit =
      segment(0xc4, {
        val b = new java.io.ByteArrayOutputStream()
        b.write((tc << 4) | th); bits.foreach(b.write); b.write(vals, 0, vals.length)
        b.toByteArray
      })
    dht(0, 0, EncDcBits, EncDcVals)
    dht(1, 1, EncAcBits, EncAcVals)
    if (restartInterval > 0)
      segment(0xdd, Array[Byte]((restartInterval >> 8).toByte,
        (restartInterval & 0xff).toByte)) // DRI
    segment(0xda, Array[Byte](3, 1, 0x01, 2, 0x01, 3, 0x01, 0, 63, 0))
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
    def padToByte(): Unit = if (nbits > 0) {
      val pad = 8 - nbits
      putBits((1 << pad) - 1, pad)
    }
    val preds = new Array[Int](3)
    def putBlock(ci: Int, value: Int): Unit = {
      val target = ((value % 256) + 256) % 256
      val dc = target - 128
      val diff = dc - preds(ci)
      preds(ci) = dc
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, cl) = dcCodes(s)
      putBits(c, cl)
      if (s > 0) putBits(if (diff >= 0) diff else diff - 1 + (1 << s), s)
      val (e, el) = acCodes(0x00) // EOB
      putBits(e, el)
    }
    val mcuSpan = if (subsample420) 16 else 8
    val mcusX = (width + mcuSpan - 1) / mcuSpan
    val mcusY = (height + mcuSpan - 1) / mcuSpan
    var rstN = 0
    var nMcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && nMcu > 0 && nMcu % restartInterval == 0) {
          padToByte()
          marker(0xd0 + (rstN & 7))
          rstN += 1
          preds(0) = 0; preds(1) = 0; preds(2) = 0
        }
        val mcuIdx = my * mcusX + mx
        if (subsample420) {
          var vy = 0
          while (vy < 2) {
            var vx = 0
            while (vx < 2) {
              putBlock(0, yBlock((my * 2 + vy) * (2 * mcusX) + (mx * 2 + vx)))
              vx += 1
            }
            vy += 1
          }
        } else {
          putBlock(0, yBlock(mcuIdx))
        }
        putBlock(1, cbBlock(mcuIdx))
        putBlock(2, crBlock(mcuIdx))
        nMcu += 1
        mx += 1
      }
      my += 1
    }
    padToByte()
    marker(0xd9) // EOI
    bos.toByteArray
  }
}
