package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-sketch hot paths.
  *
  * The same computations are expressible with nested higher-order
  * functions (transform/aggregate lambdas), but those evaluate
  * interpreted per array element — MinHash over 128 permutations via
  * `transform(sequence(0,127), i -> array_min(transform(shs, s ->
  * xxhash64(s, i))))` costs 128 x |shingles| interpreted xxhash64
  * calls per row (~minutes for a few hundred documents). These
  * expressions do one tight JVM loop per row instead: the per-100 TB
  * cost is what the arithmetic actually requires.
  *
  * Codegen: every expression implements doGenCode (none are
  * CodegenFallback — a single fallback expression disqualifies its
  * whole operator from WholeStageCodegen). The generated code calls
  * the compiled `kernel` method through a plan reference
  * (ctx.addReferenceObj): a direct virtual call per row, no
  * reflection, no InternalRow round-trip, and the surrounding
  * filter/project pipeline stays fused.
  */
object HashExprs {
  /** numHashes MinHash values of a string array in one pass. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles), numHashes))

  /** Sorted distinct sliding-window minima of a long array (winnowing). */
  def winnowMins(hashes: Column, w: Int): Column =
    Bridge.column(WinnowMins(Bridge.expression(hashes), w))

  /** Indel similarity 2*LCS/(|a|+|b|) of two strings — rapidfuzz
    * fuzz.ratio semantics (the reference's edit-distance scorer).
    */
  def indelSim(a: Column, b: Column): Column =
    Bridge.column(IndelSim(Bridge.expression(a), Bridge.expression(b)))

  /** Jaro-Winkler similarity of two strings in ppm fixed point
    * (floor(jw·1e6) — the record-linkage standard scorer, Winkler '90
    * over Jaro '89; Christen TKDE'12 recommends it over edit distance
    * for person/org names because transpositions and shared prefixes
    * dominate name noise). Integer output so the cross-engine argmax
    * (DuckDB `jaro_winkler_similarity`) compares integers, never raw
    * doubles — calibrated to DuckDB's rapidfuzz-derived semantics:
    * either side empty → 0, match window max(|a|,|b|)/2−1,
    * half-transpositions/2, boost threshold 0.7 strict, prefix ≤ 4,
    * scaling 0.1 (0 ppm mismatches over 55k random+realistic pairs).
    * The kernel iterates UTF-8 BYTES (r18) — the same unit DuckDB's
    * rapidfuzz port compares — so the cross-engine integer-argmax
    * guarantee covers non-ASCII names too (accented person/org names
    * are the biomedical headline case); the wired unicode gate
    * hash-matches a DuckDB replay over a non-ASCII fixture. The unit
    * choice is visible only in the normalization denominators (a
    * 2-byte character weighs 2), never in match quality ordering for
    * same-script comparisons.
    */
  def jaroWinklerPpm(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerPpm(Bridge.expression(a), Bridge.expression(b)))

  /** Bloom-filter membership probe for a long key (the semi-join
    * reduction predicate — see [[graft.operators.BloomJoin]]).
    */
  def mightContainLong(key: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(MightContainLong(Bridge.expression(key),
      new BloomBytes(bloomBytes)))

  /** Cosine similarity of two float/double array columns. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Random-hyperplane LSH signature (Charikar 2002) of a vector. */
  def lshSig(vec: Column, nPlanes: Int): Column =
    Bridge.column(LshSig(Bridge.expression(vec), nPlanes))

  /** Per-band LSH keys (array of `bands` longs, each `bits` wide) —
    * the unbounded-plane generalization of [[lshSig]].
    */
  def lshBandKeys(vec: Column, bands: Int, bits: Int): Column =
    Bridge.column(LshBandKeys(Bridge.expression(vec), bands, bits))

  /** Space-joined k-shingles of a token array (native one-pass). */
  def shingleStrings(toks: Column, k: Int): Column =
    Bridge.column(ShingleStrings(Bridge.expression(toks), k))

  /** 64-bit SimHash of a token array (Charikar 2002), tf-weighted. */
  def simhash64(toks: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(toks)))

  /** |a ∩ b| for two SORTED long arrays (merge scan, O(|a|+|b|)). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  /** Indices of the n centroids most cosine-similar to the vector. */
  def topCells(vec: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    Bridge.column(TopCells(Bridge.expression(vec), centroids.map(_.toArray).toArray, n))

  /** Stopword-argmax language ID over a token array (one pass). */
  def langScore(toks: Column, langs: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangScore(Bridge.expression(toks), langs))

  /** Most-frequent token's share of all tokens (one hash-map pass). */
  def topTokenShare(toks: Column): Column =
    Bridge.column(TopTokenShare(Bridge.expression(toks)))

  /** Shannon entropy (nats) of the text's code-point distribution. */
  def charEntropy(text: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(text)))

  /** Lowercase [a-z0-9]-run word tokens of a string (one byte pass). */
  def tokenizeWords(text: Column): Column =
    Bridge.column(TokenizeWords(Bridge.expression(text)))

  /** xxhash64 of every k-token shingle; optionally the sorted set. */
  def shingleHashes(toks: Column, k: Int, sortedDistinct: Boolean): Column =
    Bridge.column(ShingleHashes(Bridge.expression(toks), k, sortedDistinct))

  /** Count of tokens present in a fixed word set (one pass). */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    Bridge.column(StopwordCount(Bridge.expression(toks), words))

  /** Sum of token lengths in characters (one pass). */
  def sumTokenChars(toks: Column): Column =
    Bridge.column(SumTokenChars(Bridge.expression(toks)))

  /** Heuristic syllables: Σ per token of max(1, vowel-group count). */
  def syllableCount(toks: Column): Column =
    Bridge.column(SyllableCount(Bridge.expression(toks)))
}

/** Shared one-line doGenCode: evaluate the child null-safely, then call
  * the expression's compiled kernel through a plan reference.
  */
private[functions] trait UnaryKernelCodegen extends UnaryExpression {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.kernel($x);")
  }
}

/** Heuristic language ID: argmax over languages of DISTINCT-token
  * stopword hits; 'und' when all scores are zero; ties resolve to the
  * first language in `langs` order (callers pass them sorted). One
  * hash-set pass per row — replaces 5 array_distinct+array_intersect
  * interpreted lambdas per document.
  */
case class LangScore(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "lang_score"

  @transient private lazy val langWords: Seq[(UTF8String, Array[UTF8String])] =
    langs.map { case (l, ws) =>
      (UTF8String.fromString(l), ws.map(UTF8String.fromString).toArray)
    }
  @transient private lazy val und = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val present = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i < n) { present.add(arr.getUTF8String(i)); i += 1 }
    var bestLang: UTF8String = null
    var bestScore = 0
    langWords.foreach { case (lang, words) =>
      var score = 0
      var j = 0
      while (j < words.length) {
        if (present.contains(words(j))) score += 1
        j += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = lang }
    }
    if (bestScore > 0) bestLang else und
  }

  override protected def withNewChildInternal(newChild: Expression): LangScore =
    copy(child = newChild)
}

/** Top-n centroid indices by cosine similarity for a float/double
  * vector against a small fixed centroid matrix (the IVF coarse
  * quantizer). One pass per row; the centroid matrix (nCells x dim,
  * driver-trained) rides in the plan like a broadcast literal.
  */
case class TopCells(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(centroids.nonEmpty && n >= 1)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  private lazy val isFloatArr = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(v: ArrayData): ArrayData = {
    val nv = v.numElements()
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val d = math.min(nv, cent.length)
      var dot = 0.0
      var i = 0
      while (i < d) {
        val x: Double = if (isFloatArr) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * cent(i)
        i += 1
      }
      // zero-norm (dead) centroids score -Inf so a vector whose cosine
      // to every LIVE centroid is negative is still routed to a live
      // one; the (best < 0) guard in the selection below covers the
      // degenerate all-dead case without needing finite scores here
      scores(c) = if (norms(c) > 0) dot / norms(c) else Double.NegativeInfinity
      c += 1
    }
    // top-n by (score desc, index asc) — n is tiny, selection scan
    val nn = math.min(n, k)
    val out = new Array[Any](nn)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < nn) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && (best < 0 || scores(c) > bestScore)) { best = c; bestScore = scores(c) }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

/** Intersection size of two sorted long arrays via a single merge
  * scan. Used to verify similarity-join candidates: each candidate
  * pair is checked in O(|a|+|b|) against the two docs' shingle-hash
  * sets, instead of re-joining the exploded shingle tables (which
  * materializes |candidates| x |shingles-per-doc| rows).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh names: two instances of this expression can share one
      // generated function (e.g. value + filter), fixed locals collide
      val (nx, ny, i, j, c) = (ctx.freshName("nx"), ctx.freshName("ny"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"))
      val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
         |""".stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** 64-bit SimHash (Charikar 2002) of a document's token array: bit b
  * of the signature is set iff the term-frequency-weighted sum of
  * (+-1) votes from each distinct token's xxh64 bit b is positive.
  *
  * Entirely per-row (term frequencies are within-document), so the
  * whole fleet-wide simhash pass is shuffle-free — versus the
  * relational formulation (explode tokens -> groupBy tf -> explode 64
  * bit votes -> two more groupBys) which shuffles 64x|tokens| rows.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    // tf on the token's 64-bit hash (collision odds ~2^-64 per pair)
    val tf = new java.util.HashMap[java.lang.Long, Array[Int]]()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      val c = tf.get(h)
      if (c == null) tf.put(h, Array(1)) else c(0) += 1
      i += 1
    }
    val votes = new Array[Long](64)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getKey.longValue()
      val t = e.getValue()(0).toLong
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += t else votes(b) -= t
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** k-token shingles (space-joined) of a string array; empty when the
  * array has fewer than k elements.
  *
  * The lambda formulation `transform(sequence(1, n-k+1), i ->
  * concat_ws(' ', element_at(toks, i), ...))` textually duplicates the
  * whole `toks` subtree into every element_at — when toks is itself a
  * regex tokenization, each window re-tokenizes the document k times.
  * Here the child is evaluated once per row.
  */
case class ShingleStrings(child: Expression, k: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      out(i) = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

/** nPlanes-bit hyperplane LSH signature: bit p = sign(v . r_p) with
  * pseudo-random Rademacher components r_p[i] = +-1 derived from
  * xxh64(i, seed 42 + p) parity — the plane index is mixed into the
  * SEED, not the input (an input offset of p*C makes plane p share
  * components with plane p+1 for dims > C, correlating signature bits
  * at common embedding dims). Deterministic across executors/runs with
  * no driver state, one pass per row.
  */
case class LshSig(child: Expression, nPlanes: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(nPlanes >= 1 && nPlanes <= 63, "nPlanes in [1, 63]")
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sig"

  private lazy val isFloatArr = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(v: ArrayData): Long = {
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x: Double = if (isFloatArr) v.getFloat(i).toDouble else v.getDouble(i)
        val r = if ((XXH64.hashLong(i, 42L + p) & 1L) == 0L) 1.0 else -1.0
        dot += x * r
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}

/** Per-band LSH keys: band b's key bit j is sign(v . r_p) for GLOBAL
  * plane index p = b*bits + j, with the same xxh64(i, 42 + p)
  * Rademacher hyperplanes as [[LshSig]]. For bands*bits <= 63 each key
  * is BIT-IDENTICAL to extracting bits [b*bits, (b+1)*bits) from
  * lsh_sig's single-long signature (same planes, same seeds) — and
  * beyond 63 the total plane budget is unbounded (each KEY stays
  * <= 63 bits), which is what lets band width grow with log(corpus)
  * at scale instead of hitting the single-long ceiling. One pass,
  * O(bands*bits*dim) per row, same constant as LshSig per plane.
  */
case class LshBandKeys(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(bands >= 1, "bands >= 1")
  require(bits >= 1 && bits <= 63, "bits per band in [1, 63]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  private lazy val isFloatArr = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val p = b * bits + j
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x: Double = if (isFloatArr) v.getFloat(i).toDouble else v.getDouble(i)
          val r = if ((XXH64.hashLong(i, 42L + p) & 1L) == 0L) 1.0 else -1.0
          dot += x * r
          i += 1
        }
        if (dot > 0) key |= (1L << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

/** Cosine similarity dot(a,b)/(|a||b|) over array<float>/array<double>
  * in one loop per row. Accumulation is left-to-right in doubles —
  * bit-identical to the equivalent aggregate/zip_with fold, without the
  * per-element interpreted lambda dispatch.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val lFloat = isFloat(left)
  private lazy val rFloat = isFloat(right)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh names: two instances of this expression can share one
      // generated function (e.g. value + filter), fixed locals collide
      val (n, i, dot, nx, ny) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("dot"), ctx.freshName("nx"), ctx.freshName("ny"))
      val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
      val xe = if (lFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val ye = if (rFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $xe;
         |  double $yv = $ye;
         |  $dot += $xv * $yv;
         |  $nx += $xv * $xv;
         |  $ny += $yv * $yv;
         |}
         |double ${dot}_den = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ${dot}_den > 0.0 ? $dot / ${dot}_den : 0.0;
         |""".stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    // zero-norm vectors have no direction: similarity 0, never NaN —
    // 0/0 would yield NaN, which Spark ORDERS ABOVE every number, so a
    // NaN "similarity" would pass >= thresholds and rank first in top-k
    val den = math.sqrt(nx) * math.sqrt(ny)
    if (den > 0.0) dot / den else 0.0
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Indel similarity of two strings: 2*LCS/(|a|+|b|) — exactly rapidfuzz
  * fuzz.ratio/100 (edit distance where substitution is forbidden),
  * the scorer behind the reference's EditDistanceValueMatcher
  * (value_matching/polyfuzz.py:84 fuzz.ratio). Case-sensitive, no
  * preprocessing; two equal empty strings score 1.0. One O(n*m) DP
  * pass per pair with two rolling rows — pairs are distinct-reduced,
  * length-banded VALUES, so n*m stays tiny.
  */
case class IndelSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "indel_sim"

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val (a, b, n, m, i, j) = (ctx.freshName("a"), ctx.freshName("b"),
        ctx.freshName("n"), ctx.freshName("m"), ctx.freshName("i"), ctx.freshName("j"))
      val (prev, cur, tmp) = (ctx.freshName("prev"), ctx.freshName("cur"), ctx.freshName("tmp"))
      s"""
         |int[] $a = $x.toString().codePoints().toArray();
         |int[] $b = $y.toString().codePoints().toArray();
         |int $n = $a.length; int $m = $b.length;
         |if ($n + $m == 0) { ${ev.value} = 1.0; } else {
         |  int[] $prev = new int[$m + 1];
         |  int[] $cur = new int[$m + 1];
         |  for (int $i = 1; $i <= $n; $i++) {
         |    $cur[0] = 0;
         |    for (int $j = 1; $j <= $m; $j++) {
         |      $cur[$j] = $a[$i - 1] == $b[$j - 1]
         |        ? $prev[$j - 1] + 1
         |        : java.lang.Math.max($prev[$j], $cur[$j - 1]);
         |    }
         |    int[] $tmp = $prev; $prev = $cur; $cur = $tmp;
         |  }
         |  ${ev.value} = 2.0 * $prev[$m] / ($n + $m);
         |}
         |""".stripMargin
    })

  override def nullSafeEval(x: Any, y: Any): Any = {
    // code points, not UTF-16 units — rapidfuzz scores over code
    // points, and astral-plane chars (emoji, rare CJK) would otherwise
    // count double and diverge from the claimed parity
    val a = x.toString.codePoints().toArray
    val b = y.toString.codePoints().toArray
    val n = a.length; val m = b.length
    if (n + m == 0) return 1.0
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = 0
      var j = 1
      while (j <= m) {
        cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1) + 1
                 else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    2.0 * prev(m) / (n + m)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IndelSim =
    copy(left = l, right = r)
}

/** Jaro-Winkler in ppm fixed point (see the facade doc for the exact
  * DuckDB-calibrated semantics). Over code points, not UTF-16 units —
  * same stance as [[IndelSim]]. The arithmetic order is pinned:
  * (m/|a| + m/|b| + (m−t)/m)/3, then sim + ℓ·0.1·(1−sim) when
  * sim > 0.7 — IEEE-double-identical to DuckDB's evaluation order, so
  * the ppm floor agrees (verified empirically; exact boundary cases
  * like 0 and 1e6 are exactly representable on both).
  */
case class JaroWinklerPpm(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_ppm"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.kernel($x, $y);")
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    kernel(x.asInstanceOf[UTF8String], y.asInstanceOf[UTF8String])

  def kernel(x: UTF8String, y: UTF8String): Long = {
    // UTF-8 BYTES, not code points (r18): DuckDB's rapidfuzz-derived
    // jaro_winkler_similarity runs over the raw byte sequence, so
    // byte iteration is what extends the cross-engine integer-argmax
    // guarantee to non-ASCII names (probed: café/cafe = 848333⁄1e6 on
    // both engines — the byte-wise value; code points would say
    // 883333). ASCII strings are untouched (byte == code point).
    val a = x.getBytes
    val b = y.getBytes
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0L
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val ma = new Array[Boolean](n); val mb = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m, i + window + 1)
      var j = math.max(0, i - window)
      var done = false
      while (j < hi && !done) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0L
    // transpositions: matched sequences compared in order, halved
    var t = 0; var k = 0; i = 0
    while (i < n) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = matches.toDouble
    var sim = (md / n + md / m + (md - t / 2) / md) / 3.0
    if (sim > 0.7) {
      val lim = math.min(4, math.min(n, m))
      var p = 0
      var stop = false
      while (p < lim && !stop) {
        if (a(p) == b(p)) p += 1 else stop = true
      }
      sim = sim + p * 0.1 * (1.0 - sim)
    }
    math.floor(sim * 1e6).toLong
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerPpm =
    copy(left = l, right = r)
}

/** MinHash signature (Broder 1997) of an array<string> of shingles.
  *
  * Permutation family via the Kirsch–Mitzenmacher double-hashing trick:
  * h_j(s) = xxh64(s, seedA) + j * (xxh64(s, seedB) | 1), j in
  * [0, numHashes) — two string hashes per shingle instead of numHashes,
  * unsigned-compared so the minima are uniform over the full 64-bit ring.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(-1L) // unsigned max
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUTF8String(s, 42L)
      val step = XXH64.hashUTF8String(s, 0x9747b28cL) | 1L
      var h = h1
      var j = 0
      while (j < numHashes) {
        if (java.lang.Long.compareUnsigned(h, mins(j)) < 0) mins(j) = h
        h += step
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Winnowing fingerprint minima (Schleimer et al., SIGMOD 2003): the
  * sorted distinct minima of every length-w sliding window over the
  * shingle-hash array; a whole-array minimum when 0 < n < w; empty for
  * empty input. O(n*w) with w small — one pass per row.
  */
case class WinnowMins(child: Expression, w: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(w >= 1, "window must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = arr.toLongArray()
    val nWin = math.max(n - w + 1, 1)
    val mins = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      var m = hs(i)
      var j = i + 1
      val end = math.min(i + w, n)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var uniq = 1
    i = 1
    while (i < nWin) {
      if (mins(i) != mins(uniq - 1)) { mins(uniq) = mins(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, uniq))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

/** Most-frequent token's share of all tokens (the Gopher-style
  * repetition signal): one hash-map counting pass per row, tracking the
  * running mode. Replaces the nested transform(array_distinct, t ->
  * size(filter(toks, x == t))) HOF — O(distinct x tokens) interpreted
  * comparisons per row, ~10^8 for a 10k-token document — with O(tokens)
  * compiled work. 0.0 for an empty array.
  */
case class TopTokenShare(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_token_share"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val tf = new java.util.HashMap[UTF8String, Array[Int]](math.max(16, n * 2))
    var max = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var c = tf.get(t)
      if (c == null) { c = Array(0); tf.put(t, c) }
      c(0) += 1
      if (c(0) > max) max = c(0)
      i += 1
    }
    max.toDouble / n
  }

  override protected def withNewChildInternal(newChild: Expression): TopTokenShare =
    copy(child = newChild)
}

/** Character-entropy quality signal: Shannon entropy (nats) of the
  * text's Unicode code-point distribution — near zero for degenerate
  * repetition, anomalously high for random gibberish; the classic
  * cheap detector used alongside the Gopher ratios. The final sum
  * runs in ASCENDING code-point order (TreeMap iteration), which the
  * DuckDB oracle mirrors with list(n ORDER BY c) — UTF-8 binary
  * string order is code-point order, so the float accumulation order
  * is identical cross-engine and the rounded value hash-matches.
  * One compiled pass per row; empty text scores 0.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  def kernel(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      var c = counts.get(cp)
      if (c == null) { c = Array(0L); counts.put(cp, c) }
      c(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Lowercase word tokenization: maximal runs of [a-z0-9] after
  * Unicode lowercasing — byte-for-byte the same tokens as
  * `filter(split(lower(text), "[^a-z0-9]+"), t -> t != "")` (UTF-8
  * multibyte units are >= 0x80, so byte-level scanning can never split
  * inside a code point). The HOF form drags an interpreted lambda into
  * every text operator's projection and disqualifies it from
  * WholeStageCodegen; this is one compiled pass over the bytes.
  */
case class TokenizeWords(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_words"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  def kernel(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        var j = i + 1
        while (j < n && {
          val c = bytes(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        out.add(UTF8String.fromBytes(bytes, i, j - i))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}

/** xxhash64(seed 42) of every k-token shingle — the fused form of
  * transform(shingle_strings(toks, k), s -> xxhash64(s)), whose lambda
  * is interpreted and breaks codegen. sortedDistinct=true additionally
  * folds in array_sort(array_distinct(...)) (the per-document shingle
  * SET, as used by the Jaccard machinery); false keeps positional
  * order (as needed by winnowing window minima).
  */
case class ShingleHashes(child: Expression, k: Int, sortedDistinct: Boolean)
    extends UnaryExpression with UnaryKernelCodegen {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (sortedDistinct) "shingle_hash_set" else "shingle_hashes"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val hs = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      val sh = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      hs(i) = XXH64.hashUTF8String(sh, 42L)
      i += 1
    }
    if (!sortedDistinct) return new GenericArrayData(hs)
    java.util.Arrays.sort(hs)
    var uniq = 1
    i = 1
    while (i < hs.length) {
      if (hs(i) != hs(uniq - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, uniq))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Count of tokens (with multiplicity) that appear in a fixed word
  * set — the stopword counter of the quality-stats struct, without the
  * filter(toks, t -> array_contains(...)) interpreted lambda.
  */
case class StopwordCount(child: Expression, words: Seq[String])
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "stopword_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) { if (set.contains(arr.getUTF8String(i))) c += 1; i += 1 }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
}

/** Sum of token lengths in characters (for avg token length) — the
  * aggregate(toks, 0, (acc, t) -> acc + length(t)) fold without the
  * interpreted lambda.
  */
case class SumTokenChars(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_token_chars"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) { c += arr.getUTF8String(i).numChars(); i += 1 }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): SumTokenChars =
    copy(child = newChild)
}

/** Heuristic syllable count summed over a token array: each token
  * contributes max(1, its [aeiouy]-group count) — the classic
  * readability-formula approximation (every written word carries at
  * least one syllable; vowel runs approximate nuclei). One pass, no
  * regex; the DuckDB twin replays it as
  * greatest(1, len(regexp_extract_all(t, '[aeiouy]+'))) per token —
  * identical by construction (a vowel GROUP is exactly a maximal
  * vowel run). Tokens are the lowercase [a-z0-9] runs of
  * TokenizeWords, so case never matters here.
  */
case class SyllableCount(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "syllable_count"

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val s = t.toString
      var groups = 0
      var inGroup = false
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        val v = c == 'a' || c == 'e' || c == 'i' || c == 'o' ||
          c == 'u' || c == 'y'
        if (v && !inGroup) groups += 1
        inGroup = v
        j += 1
      }
      total += math.max(1, groups)
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): SyllableCount =
    copy(child = newChild)
}

/** Serialized Bloom filter bytes with CONTENT-based equality.
  * Case-class fields of type Array[Byte] compare by reference, so two
  * semantically identical probe expressions would never be `equal` —
  * defeating Catalyst plan canonicalization / exchange & subexpression
  * reuse across identical probes (conservatively safe, but wasteful).
  * Wrapping in a value holder restores structural equality.
  */
final class BloomBytes(val bytes: Array[Byte]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case b: BloomBytes => java.util.Arrays.equals(bytes, b.bytes)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(bytes)
}

/** Membership probe of a LONG key against a driver-built Bloom filter
  * (org.apache.spark.util.sketch.BloomFilter bytes). The serialized
  * filter rides in the generated code as a plan reference — at
  * cluster scale it ships once per executor with the task closure —
  * and deserializes once per JVM via the transient lazy. False
  * positives only (never drops a real match), codegen'd, stays inside
  * whole-stage pipelines.
  */
case class MightContainLong(child: Expression, bloom0: BloomBytes)
    extends UnaryExpression with UnaryKernelCodegen {
  private def bloomBytes: Array[Byte] = bloom0.bytes
  require(bloomBytes.nonEmpty, "empty bloom filter bytes")
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "might_contain_long"

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Long])

  def kernel(x: Long): Boolean = bloom.mightContainLong(x)

  override protected def withNewChildInternal(newChild: Expression): MightContainLong =
    copy(child = newChild)
}
