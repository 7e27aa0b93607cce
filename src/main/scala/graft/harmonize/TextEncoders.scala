package graft.harmonize

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** THE TEXT-ENCODER PLUG-IN CONTRACT for harmonization — the
  * value/schema-matching twin of [[graft.multimodal.BinaryMeta
  * .FeatureEncoder]] (r17's multimodal seam). The reference ships two
  * model-backed matchers this seam re-expresses as "bring your model":
  * the contrastive-learning column encoder
  * (`one2one/contrastivelearning.py:1`, `models/contrastive_learning/`)
  * and the fasttext/embedding value matcher
  * (`value_matching/polyfuzz.py:100`). Neither model can ship here
  * (external weights), but everything AROUND the model — batching,
  * distinct-domain reduction, broadcast of the vocabulary side,
  * cosine scoring, thresholding, per-source argmax — is engine
  * plumbing, identical for the bundled stand-in and a real encoder:
  * swapping encoders cannot change the plumbing (spec-gated).
  *
  * Contract mirrors FeatureEncoder deliberately: pure strings→vectors
  * over a BATCH (one forward pass per batch, not per value),
  * serializable (ships to executors once per task; weights should
  * load lazily inside the first encodeBatch), deterministic for a
  * given value (the match results must be stable across retries).
  */
trait TextEncoder extends Serializable {

  /** Output dimensionality — constant per encoder; every returned
    * vector must have exactly this length (violations refuse loudly
    * in the plumbing, they are never padded or truncated).
    */
  def dim: Int

  /** Encode one batch of values; must return exactly one `dim`-length
    * vector per input, in input order. Values are non-null, trimmed
    * and non-empty ([[ValueMatcher.domain]] runs first).
    */
  def encodeBatch(values: Array[String]): Array[Array[Float]]
}

/** The bundled default: the hashing-trick character-trigram profile
  * (feature hashing, Weinberger et al. 2009) — the same math as
  * [[ValueMatcher.profileEmbeddingMatch]]'s expression path, with the
  * SAME xxhash64 seeds (42 for the component index, the 42→h1→fold-1
  * chain for the sign), so the encoder path and the oracle-gated
  * expression path produce the same profiles up to float32 rounding.
  * Trigrams are taken over the lowercased value; values shorter than
  * 3 characters embed as the zero vector (cosine 0 to everything —
  * they fall below any positive threshold and surface as unmatched,
  * exactly like the expression path where gram-less values vanish
  * from the profile frame).
  *
  * Caveat (documented, not load-bearing for ASCII vocabularies): SQL
  * `substr` slices by codepoint while this kernel slices by UTF-16
  * char, so values with supplementary-plane characters can gram
  * differently from the expression path.
  */
final class HashingProfileEncoder(val dim: Int = 64) extends TextEncoder {
  require(dim > 0, s"HashingProfileEncoder dim must be positive, got $dim")

  override def encodeBatch(values: Array[String]): Array[Array[Float]] =
    values.map { raw =>
      val v = raw.toLowerCase(java.util.Locale.ROOT)
      val acc = new Array[Double](dim)
      var i = 0
      while (i + 3 <= v.length) {
        val g = UTF8String.fromString(v.substring(i, i + 3))
        // F.xxhash64(gram): seed 42 over the single string child
        val h1 = XxHash64Function.hash(g, StringType, 42L)
        val idx = ((h1 % dim) + dim) % dim
        // F.xxhash64(gram, lit(1)): fold the int 1 with seed h1
        val h2 = XxHash64Function.hash(1, IntegerType, h1)
        acc(idx.toInt) += (if (((h2 % 2) + 2) % 2 == 0) 1.0 else -1.0)
        i += 1
      }
      acc.map(_.toFloat)
    }
}
