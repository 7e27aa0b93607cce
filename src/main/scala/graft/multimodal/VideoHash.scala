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
