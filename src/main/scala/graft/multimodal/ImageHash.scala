package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Perceptual image hashing for near-duplicate IMAGE dedup (r17 —
  * the LAION-style corpus-dedup need: the codecs decode five image
  * formats, this is what makes the rasters dedupable). A 64-bit
  * DIFFERENCE HASH (dHash — the standard perceptual-hash family
  * member with an exact integer formulation): the luma raster is
  * area-pooled onto a 9×8 grid and bit (r·8+c) records whether cell
  * (r,c) is brighter than its right neighbor (r,c+1) — the horizontal
  * gradient sign field, which survives re-encoding, container
  * changes, and resampling, while any visually different image flips
  * many bits.
  *
  * EXACT INTEGER end to end, so a SQL twin can replay the whole
  * pipeline from closed-form pixels: luma is the ITU-R 601 integer
  * weighting ×1000 (299·R + 587·G + 114·B; ×1000 for gray), pooling
  * keeps per-cell (sum, count), and the brightness comparison
  * cross-multiplies (sumL·cntR > sumR·cntL) instead of dividing — no
  * float anywhere, no rounding rule to drift cross-engine.
  *
  * Scale shape: the hash is ONE per-row kernel call over the blob
  * column (codegen'd expression, no UDF, no shuffle); near-dup pairs
  * then ride the SAME pigeonhole hamming band join as SimHash text
  * dedup ([[graft.dedup.Dedup.hammingPairs]]) — candidates are
  * band-bucket collisions, never all-pairs, and the banded signature
  * table persists bucketed for incremental daily-batch probes.
  */
object ImageHash {

  /** Decode any supported container (PNG/GIF/BMP/JPEG, sniffed) to a
    * luma raster: (width, height, row-major luma×1000). Gray rasters
    * use v·1000 — identical to the RGB weighting of a gray triplet,
    * so a gray PNG and its RGB re-encode hash IDENTICALLY. None on
    * undecodable/oversized payloads.
    */
  private[graft] def lumaRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 8) return None
    val b0 = bytes(0) & 0xff
    val b1 = bytes(1) & 0xff
    if (b0 == 0x89 && b1 == 'P') {
      PngCodec.decodePixels(bytes).map { px =>
        val out = new Array[Int](px.width * px.height)
        val ch = px.channels
        var i = 0
        val n = px.width * px.height
        while (i < n) {
          val base = i * ch
          out(i) =
            if (ch >= 3)
              299 * (px.data(base) & 0xff) + 587 * (px.data(base + 1) & 0xff) +
                114 * (px.data(base + 2) & 0xff)
            else 1000 * (px.data(base) & 0xff) // gray / gray+alpha
          i += 1
        }
        (px.width, px.height, out)
      }
    } else if (b0 == 'G' && b1 == 'I') {
      GifCodec.decodeIndexed(bytes).map { case (w, h, pal, idx) =>
        val out = new Array[Int](w * h)
        var i = 0
        while (i < out.length) {
          val p = (idx(i) & 0xff) * 3
          out(i) = 299 * (pal(p) & 0xff) + 587 * (pal(p + 1) & 0xff) +
            114 * (pal(p + 2) & 0xff)
          i += 1
        }
        (w, h, out)
      }
    } else if (b0 == 'B' && b1 == 'M') {
      BmpCodec.decodePixels(bytes).map { px =>
        val out = new Array[Int](px.width * px.height)
        var i = 0
        while (i < out.length) {
          val base = i * 3
          out(i) = 299 * (px.data(base) & 0xff) + 587 * (px.data(base + 1) & 0xff) +
            114 * (px.data(base + 2) & 0xff)
          i += 1
        }
        (px.width, px.height, out)
      }
    } else if (b0 == 0xff && b1 == 0xd8) {
      // color first (3 components), else grayscale
      JpegCodec.decodeColorRaster(bytes).map { case (w, h, rgb) =>
        val out = new Array[Int](w * h)
        var i = 0
        while (i < out.length) {
          out(i) = 299 * rgb(i * 3) + 587 * rgb(i * 3 + 1) + 114 * rgb(i * 3 + 2)
          i += 1
        }
        (w, h, out)
      }.orElse(JpegCodec.decodeRaster(bytes).map { case (w, h, px) =>
        val out = new Array[Int](w * h)
        var i = 0
        while (i < out.length) { out(i) = 1000 * px(i); i += 1 }
        (w, h, out)
      })
    } else None
  }

  /** 64-bit dHash of an encoded image; null when undecodable or when
    * w·h > 2^28 (the Long cross-multiply sumL·cntR needs cell counts
    * ≤ ~6e6, and 2^28 px / 72 cells leaves >20% headroom — far above
    * the codecs' own payload guards anyway).
    */
  def dhash64(bytes: Array[Byte]): java.lang.Long = {
    val (w, h, luma) = lumaRaster(bytes) match {
      case Some(t) => t
      case None => return null
    }
    if (w.toLong * h > (1L << 28)) return null
    // area pooling onto the 9x8 grid: pixel (x,y) lands in cell
    // (y*8/h, x*9/w) — integer floor, the exact rule the SQL twin
    // replays; cells can be empty when w<9 or h<8 (count 0, sum 0 —
    // the cross-multiply comparison then reads 0 > 0 = false)
    val sum = new Array[Long](72)
    val cnt = new Array[Long](72)
    val colCell = new Array[Int](w)
    var x = 0
    while (x < w) { colCell(x) = x * 9 / w; x += 1 }
    var y = 0
    while (y < h) {
      val rowBase = (y * 8 / h) * 9
      val off = y * w
      x = 0
      while (x < w) {
        val cell = rowBase + colCell(x)
        sum(cell) += luma(off + x)
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val l = r * 9 + c
        // mean(l) > mean(l+1) without division: sumL*cntR > sumR*cntL
        if (sum(l) * cnt(l + 1) > sum(l + 1) * cnt(l))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** dHash column over a binary payload (codegen'd kernel). */
  def dhash64Col(blob: Column): Column =
    Bridge.column(DHash64(Bridge.expression(blob)))

  /** (id, dhash) signatures of an image-blob frame; undecodable
    * payloads are dropped (no meaningful signature — the
    * [[graft.dedup.Dedup.simhash]] contract).
    */
  def dhashDf(df: DataFrame, idCol: String, blobCol: String = "blob"): DataFrame =
    df.select(F.col(idCol).as("id"), dhash64Col(F.col(blobCol)).as("dhash"))
      .where(F.col("dhash").isNotNull)

  /** Near-dup image pairs with hamming(dhash) ≤ maxHamming — the
    * SimHash pigeonhole band join over perceptual signatures.
    */
  def dhashPairs(df: DataFrame, idCol: String, maxHamming: Int = 3,
                 blobCol: String = "blob"): DataFrame =
    graft.dedup.Dedup.hammingPairs(dhashDf(df, idCol, blobCol),
      "dhash", maxHamming)

  /** Persist banded dHash signatures as a bucketed+sorted table — the
    * served-index half of daily-batch image dedup (the
    * minhashIndexBuild pattern: band-bucket layout means a probe
    * join needs no corpus-side shuffle).
    */
  def dhashIndexBuild(sigs: DataFrame, table: String, maxHamming: Int = 3,
                      nBuckets: Int = 64): Unit =
    graft.sources.Sources.writeBucketedMulti(
      graft.dedup.Dedup.hammingBanded(sigs, "dhash", maxHamming),
      table, bucketBy = Seq("band", "key"), nBuckets = nBuckets,
      sortBy = Seq("band", "key"))

  /** All near-dup pairs TOUCHING a batch: batch×index ∪ batch×batch,
    * via the batch's banded signatures probing the persisted banded
    * index (read back as `indexBanded`) — the index side reads in
    * place, only the batch shuffles. Returns (id1, id2, hamming)
    * with id1 < id2, same contract as [[dhashPairs]].
    */
  def dhashIndexProbe(batchSigs: DataFrame, indexBanded: DataFrame,
                      maxHamming: Int = 3): DataFrame = {
    val batchBanded = graft.dedup.Dedup.hammingBanded(
      batchSigs, "dhash", maxHamming)
    graft.dedup.Dedup.hammingPairsFromBanded(
      batchBanded,
      indexBanded.select("id", "dhash", "band", "key")
        .unionByName(batchBanded),
      "dhash", maxHamming)
  }

  // -------------------------------------------------- pHash (DCT hash)

  /** Fixed-point DCT-II basis, 2^14 scale: COS(u)(x) =
    * round(cos((2x+1)·u·π/64) · 16384) for u ∈ 0..7 (only the low 8
    * frequencies are hashed), x ∈ 0..31. Every row u ≥ 1 sums to
    * EXACTLY zero — the angles pair off with exact sign flips, and
    * Math.round is sign-symmetric here because a half-integer scaled
    * cosine would need cos ∈ ℚ, which by Niven's theorem only happens
    * at 0/±1/±1/2 (none of which land on .5·2^-14) — so a constant
    * raster provably zeroes every non-DC coefficient (spec-asserted
    * directly on the table).
    */
  private[graft] val dctBasis: Array[Array[Int]] =
    Array.tabulate(8, 32) { (u, x) =>
      Math.round(Math.cos((2 * x + 1) * u * Math.PI / 64.0) * 16384.0).toInt
    }

  /** 64-bit perceptual DCT hash (pHash — the second standard
    * perceptual-hash family member beside [[dhash64]]; robust to the
    * GLOBAL transforms dHash's local gradients are blind to): the
    * luma raster is rect-pooled onto a 32×32 grid, a 32×32 DCT-II
    * keeps the low 8×8 frequency block, and bit (u·8+v) records
    * whether coefficient (u,v) exceeds the median of the 63 non-DC
    * coefficients (bit 0, the DC slot, is always 0). INTEGER
    * FIXED-POINT end to end — deterministic across runs, partitions
    * and JVMs:
    *  - pooled cell value = (sum·1024)/count, integer floor, over the
    *    pixel rect [i·h/32, max((i+1)·h/32, i·h/32+1)) × [same for x]
    *    (degenerates to nearest-sampling when the image is smaller
    *    than the grid — no empty cells);
    *  - separable DCT in Long with a >>14 rescale between the two
    *    passes (max |acc| ≈ 1.4e14 and 4.4e15 — no overflow);
    *  - median = the 32nd smallest (lower median), strict > sets the
    *    bit.
    * EXACT invariances (spec-gated): container re-encode (same
    * raster → same integers), uniform brightness shift (the shift
    * adds a multiple of 2^14 at every stage — the basis rows sum to
    * zero, so only the excluded DC coefficient moves), and a constant
    * raster hashes to exactly 0 (every non-DC coefficient is provably
    * zero). Contrast scaling is ROBUST but not bit-exact (the >>14
    * rescale floor interacts with odd low bits). Null for undecodable
    * or oversized payloads, like dhash64. Pairs ride the SAME
    * pigeonhole band join.
    */
  def phash64(bytes: Array[Byte]): java.lang.Long = {
    val (w, h, luma) = lumaRaster(bytes) match {
      case Some(t) => t
      case None => return null
    }
    if (w.toLong * h > (1L << 28)) return null
    // rect-pool to 32×32 (mean ×1024, floor)
    val v = new Array[Long](32 * 32)
    var i = 0
    while (i < 32) {
      val y0 = i * h / 32
      val y1 = math.max((i + 1) * h / 32, y0 + 1)
      var j = 0
      while (j < 32) {
        val x0 = j * w / 32
        val x1 = math.max((j + 1) * w / 32, x0 + 1)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += luma(y * w + x); x += 1 }
          y += 1
        }
        v(i * 32 + j) = sum * 1024 / ((y1 - y0).toLong * (x1 - x0))
        j += 1
      }
      i += 1
    }
    // separable fixed-point DCT: rows first (over x=j), then columns
    val tmp = new Array[Long](8 * 32) // tmp(u)(i) — row transform
    var u = 0
    while (u < 8) {
      val base = dctBasis(u)
      i = 0
      while (i < 32) {
        var acc = 0L
        var j = 0
        while (j < 32) { acc += v(i * 32 + j) * base(j); j += 1 }
        tmp(u * 32 + i) = acc >> 14
        i += 1
      }
      u += 1
    }
    val coef = new Array[Long](64)
    u = 0
    while (u < 8) {
      var vv = 0
      while (vv < 8) {
        val base = dctBasis(vv)
        var acc = 0L
        i = 0
        while (i < 32) { acc += tmp(u * 32 + i) * base(i); i += 1 }
        // coefficient (y-freq vv, x-freq u) at index vv*8+u; DC at 0
        coef(vv * 8 + u) = acc
        vv += 1
      }
      u += 1
    }
    // median of the 63 non-DC coefficients (lower median = 32nd
    // smallest), strict > sets bit (u*8+v); bit 0 stays 0
    val sorted = new Array[Long](63)
    System.arraycopy(coef, 1, sorted, 0, 63)
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var hash = 0L
    var b = 1
    while (b < 64) {
      if (coef(b) > med) hash |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** pHash column over a binary payload (codegen'd kernel). */
  def phash64Col(blob: Column): Column =
    Bridge.column(PHash64(Bridge.expression(blob)))

  /** (id, phash) signatures; undecodable payloads dropped. */
  def phashDf(df: DataFrame, idCol: String, blobCol: String = "blob"): DataFrame =
    df.select(F.col(idCol).as("id"), phash64Col(F.col(blobCol)).as("phash"))
      .where(F.col("phash").isNotNull)

  /** Near-dup image pairs with hamming(phash) ≤ maxHamming. */
  def phashPairs(df: DataFrame, idCol: String, maxHamming: Int = 3,
                 blobCol: String = "blob"): DataFrame =
    graft.dedup.Dedup.hammingPairs(phashDf(df, idCol, blobCol),
      "phash", maxHamming)
}

/** Codegen'd 64-bit dHash over a binary column — the perceptual-hash
  * sibling of [[graft.functions]]' SimHash64 kernel (decode + pool +
  * gradient signs in one tight JVM call per row; nullable output for
  * undecodable payloads).
  */
case class DHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  def kernel(bytes: Array[Byte]): java.lang.Long = ImageHash.dhash64(bytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("dh")
      s"""
         |java.lang.Long $r = $ref.kernel($x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DHash64 =
    copy(child = newChild)
}

/** Codegen'd 64-bit pHash over a binary column (decode + 32×32 rect
  * pool + fixed-point DCT + median threshold in one JVM call per row;
  * nullable for undecodable payloads — the DHash64 stance).
  */
case class PHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phash64"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  def kernel(bytes: Array[Byte]): java.lang.Long = ImageHash.phash64(bytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("ph")
      s"""
         |java.lang.Long $r = $ref.kernel($x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PHash64 =
    copy(child = newChild)
}
