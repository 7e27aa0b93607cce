package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Perceptual AUDIO hashing for near-duplicate clip dedup — the
  * [[ImageHash]] idea in one dimension (a chromaprint-lite energy
  * profile): the PCM waveform is pooled onto 65 proportional TIME
  * bins (duration-independent — a re-sampled or re-paced copy of the
  * same material pools to the same profile shape) and bit i of the
  * 64-bit hash records whether mean |amplitude| RISES from bin i to
  * bin i+1. The energy-envelope sign field survives the transforms a
  * dedup pass must ignore and flips everywhere for different
  * material.
  *
  * EXACT INTEGER end to end, and — unlike the image pool — with NO
  * division anywhere (the comparison cross-multiplies raw per-bin
  * (sumAbs, nSamples)), so two invariances hold BIT-FOR-BIT and are
  * provable:
  *  - uniform volume scaling ×k (no clipping): every sumAbs scales by
  *    k, both cross-multiply sides scale by k — identical hash;
  *  - channel replication (mono → stereo duplicate): per-bin sumAbs
  *    and nSamples both double, both sides scale by 4 — identical
  *    hash.
  * Overflow-safe unconditionally: WavCodec caps payloads at 64 MiB
  * (≤ 2^25 samples), bins are proportional (≤ ~2^19.5 samples each),
  * so |sumAbs·nSamples| < 2^54.
  *
  * A SQL twin replays the WHOLE pipeline closed-form (bin = f·65/n
  * integer floor, |sample| sums, cross-multiply bits, signed 64-bit
  * assembly) — the image-dHash oracle standard, stronger than a
  * rows-only dump. Pairs ride the shared pigeonhole hamming band
  * join ([[graft.dedup.Dedup.hammingPairs]]).
  */
object AudioHash {

  private val NBins = 65

  /** 64-bit audio energy-envelope hash; null for undecodable
    * payloads. Bins with no frames (clips shorter than 65 frames)
    * contribute (0, 0) and the strict cross-multiply reads 0 > 0 =
    * false — the ImageHash empty-cell rule.
    */
  def audioHash64(bytes: Array[Byte]): java.lang.Long = {
    val bins = WavCodec.decodeTimeBins(bytes, NBins) match {
      case Some(b) => b
      case None => return null
    }
    val sab = new Array[Long](NBins)
    val n = new Array[Long](NBins)
    bins.foreach { tb =>
      sab(tb.bin) = tb.sumAbs
      n(tb.bin) = tb.nSamples
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (sab(i + 1) * n(i) > sab(i) * n(i + 1))
        hash |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** audio hash column over a binary payload (codegen'd kernel). */
  def audioHash64Col(blob: Column): Column =
    Bridge.column(AHash64(Bridge.expression(blob)))

  /** (id, ahash) signatures; undecodable payloads dropped. */
  def audioHashDf(df: DataFrame, idCol: String,
                  blobCol: String = "blob"): DataFrame =
    df.select(F.col(idCol).as("id"), audioHash64Col(F.col(blobCol)).as("ahash"))
      .where(F.col("ahash").isNotNull)

  /** Near-dup clip pairs with hamming(ahash) ≤ maxHamming. */
  def audioHashPairs(df: DataFrame, idCol: String, maxHamming: Int = 3,
                     blobCol: String = "blob"): DataFrame =
    graft.dedup.Dedup.hammingPairs(audioHashDf(df, idCol, blobCol),
      "ahash", maxHamming)
}

/** Codegen'd 64-bit audio energy-envelope hash over a binary column
  * (WAV decode + 65-bin pool + gradient signs in one JVM call per
  * row; nullable for undecodable payloads — the DHash64 stance).
  */
case class AHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_hash64"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  def kernel(bytes: Array[Byte]): java.lang.Long = AudioHash.audioHash64(bytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("ah")
      s"""
         |java.lang.Long $r = $ref.kernel($x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): AHash64 =
    copy(child = newChild)
}
