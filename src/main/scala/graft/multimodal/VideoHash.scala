package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Perceptual VIDEO hashing — the temporal member of the hash family
  * ([[ImageHash]] spatial, [[AudioHash]] waveform): the clip's
  * per-frame BRIGHTNESS CURVE (exact integer (sum, nSamples) per
  * frame from [[AviCodec.decodeFrameStats]]) is pooled onto 65
  * proportional TIME bins and bit i of the 64-bit hash records
  * whether mean brightness RISES from bin i to bin i+1 — the temporal
  * luminance envelope, which survives the remasterings a video dedup
  * pass must ignore (re-encode, resolution change, grading shifts)
  * and flips everywhere for different material.
  *
  * EXACT INTEGER with NO division (raw cross-multiply
  * sum(i+1)·n(i) > sum(i)·n(i+1)), so three invariances hold
  * BIT-FOR-BIT and are provable:
  *  - uniform brightness SHIFT +c (no clipping): both sides gain the
  *    same c·n(i)·n(i+1) term — identical hash;
  *  - nearest-neighbor spatial upscale ×2: every original pixel
  *    appears exactly 4 times, sum and n both ×4 — identical hash;
  *  - frame-size-preserving re-encode (same rasters) — identical
  *    bytes decoded.
  * Overflow-safe unconditionally under the 64 MiB payload cap
  * (≤ 2^26 samples; |sum·n| < 2^61 even with every frame in one bin).
  *
  * The SQL twin replays the whole pipeline closed-form (per-frame
  * sums from the fixture formula, frame → bin floor rule,
  * cross-multiply bits, signed assembly) — the AudioHash oracle
  * standard. Pairs ride the shared pigeonhole hamming band join.
  */
object VideoHash {

  private val NBins = 65

  /** 64-bit temporal luminance-envelope hash; null for undecodable
    * payloads or zero-frame clips. Bins with no frames (clips shorter
    * than 65 frames) read 0 > 0 = false — the ImageHash empty-cell
    * rule.
    */
  def videoHash64(bytes: Array[Byte]): java.lang.Long = {
    val frames = AviCodec.decodeFrameStats(bytes, stride = 1) match {
      case Some(f) if f.nonEmpty => f
      case _ => return null
    }
    val nf = frames.length
    val sum = new Array[Long](NBins)
    val n = new Array[Long](NBins)
    var i = 0
    while (i < nf) {
      val fs = frames(i)
      val bin = (fs.frameNo.toLong * NBins / nf).toInt
      sum(bin) += fs.sumVal
      n(bin) += fs.nSamples
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (sum(i + 1) * n(i) > sum(i) * n(i + 1))
        hash |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** video hash column over a binary payload (codegen'd kernel). */
  def videoHash64Col(blob: Column): Column =
    Bridge.column(VHash64(Bridge.expression(blob)))

  /** (id, vhash) signatures; undecodable payloads dropped. */
  def videoHashDf(df: DataFrame, idCol: String,
                  blobCol: String = "blob"): DataFrame =
    df.select(F.col(idCol).as("id"), videoHash64Col(F.col(blobCol)).as("vhash"))
      .where(F.col("vhash").isNotNull)

  /** Near-dup clip pairs with hamming(vhash) ≤ maxHamming. */
  def videoHashPairs(df: DataFrame, idCol: String, maxHamming: Int = 3,
                     blobCol: String = "blob"): DataFrame =
    graft.dedup.Dedup.hammingPairs(videoHashDf(df, idCol, blobCol),
      "vhash", maxHamming)

  /** 64-bit SPATIAL video hash (r18 — the arm [[videoHash64]] lacks:
    * the temporal hash sees only the per-frame brightness curve, so
    * two different videos with the same curve collide and a spatial
    * edit that preserves frame sums is invisible to it): every
    * `stride`-th frame's raster is pooled onto the dHash 9×8 grid
    * ([[AviCodec.decodeFramePooled]], exact integer (count, sum) per
    * cell), cells ACCUMULATE across the sampled keyframes, and bit
    * (r, c) records whether the pooled mean falls from column c to
    * c+1 — [[ImageHash.dhash64]]'s horizontal-gradient rule over the
    * clip's average frame. Same no-division cross-multiply, so two
    * invariances are unconditional: uniform brightness shift
    * (+c·cnt cancels across the comparison) and raster-identical
    * re-encode; 2× nearest-neighbor upscale is invariant WHEN the
    * cell map commutes with the doubling — dims where every grid
    * cell's pixel block doubles exactly (h a multiple of 8, w of 9;
    * e.g. 36×8 → 72×16) — unlike the temporal hash, which pools
    * whole frames and is upscale-invariant unconditionally.
    * Null for undecodable/zero-frame clips.
    * Overflow-safe: 64 MiB cap ⇒ ≤ 2^26 samples, |sum·cnt| < 2^60.
    */
  def videoSpatialHash64(bytes: Array[Byte],
                         stride: Int = 4): java.lang.Long = {
    val cells = AviCodec.decodeFramePooled(bytes, stride, gy = 8, gx = 9) match {
      case Some(c) if c.nonEmpty => c
      case _ => return null
    }
    val sum = new Array[Long](72)
    val cnt = new Array[Long](72)
    cells.foreach { fp =>
      val cell = fp.cy * 9 + fp.cx
      sum(cell) += fp.sumVal
      cnt(cell) += fp.nSamples
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val l = r * 9 + c
        if (sum(l) * cnt(l + 1) > sum(l + 1) * cnt(l))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** spatial video hash column (codegen'd kernel). */
  def videoSpatialHash64Col(blob: Column, stride: Int = 4): Column =
    Bridge.column(VSpatialHash64(Bridge.expression(blob), stride))

  /** (id, thash, shash) dual signatures; undecodable payloads
    * dropped (both hashes decode the same container, so they are
    * null together).
    */
  def videoDualHashDf(df: DataFrame, idCol: String,
                      blobCol: String = "blob",
                      stride: Int = 4): DataFrame =
    df.select(F.col(idCol).as("id"),
        videoHash64Col(F.col(blobCol)).as("thash"),
        videoSpatialHash64Col(F.col(blobCol), stride).as("shash"))
      .where(F.col("thash").isNotNull && F.col("shash").isNotNull)

  /** Dual-arm near-dup clip pairs (r18): candidates from the
    * pigeonhole band join on the TEMPORAL hash (any pair passing
    * both thresholds has temporal hamming ≤ maxTemporalHamming, so
    * temporal banding alone is a complete candidate generator for
    * the AND rule), then BOTH arms verify — temporal-only collisions
    * (different material, same brightness curve) are split by the
    * spatial arm, while genuine remasters and bounded spatial edits
    * pass both. Output (id1, id2, t_hamming, s_hamming).
    */
  def videoNearDupPairs(df: DataFrame, idCol: String,
                        maxTemporalHamming: Int = 3,
                        maxSpatialHamming: Int = 3,
                        blobCol: String = "blob",
                        stride: Int = 4): DataFrame = {
    val sigs = videoDualHashDf(df, idCol, blobCol, stride)
    val tPairs = graft.dedup.Dedup.hammingPairs(
        sigs.select("id", "thash"), "thash", maxTemporalHamming)
      .withColumnRenamed("hamming", "t_hamming")
    tPairs
      .join(sigs.select(F.col("id").as("id1"), F.col("shash").as("__s1")), "id1")
      .join(sigs.select(F.col("id").as("id2"), F.col("shash").as("__s2")), "id2")
      .select(F.col("id1"), F.col("id2"), F.col("t_hamming"),
        F.bit_count(F.col("__s1").bitwiseXOR(F.col("__s2"))).as("s_hamming"))
      .where(F.col("s_hamming") <= maxSpatialHamming)
  }
}

/** Codegen'd 64-bit temporal luminance-envelope hash over a binary
  * column (AVI decode + 65-bin pool + gradient signs in one JVM call
  * per row; nullable for undecodable payloads — the DHash64 stance).
  */
case class VHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "video_hash64"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  def kernel(bytes: Array[Byte]): java.lang.Long = VideoHash.videoHash64(bytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("vh")
      s"""
         |java.lang.Long $r = $ref.kernel($x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): VHash64 =
    copy(child = newChild)
}

/** Codegen'd 64-bit SPATIAL video hash (keyframe-pooled dHash grid);
  * `stride` is a plan-time constant. Nullable for undecodable
  * payloads — the DHash64 stance.
  */
case class VSpatialHash64(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "video_spatial_hash64"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  def kernel(bytes: Array[Byte]): java.lang.Long =
    VideoHash.videoSpatialHash64(bytes, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("vsh")
      s"""
         |java.lang.Long $r = $ref.kernel($x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): VSpatialHash64 =
    copy(child = newChild)
}
