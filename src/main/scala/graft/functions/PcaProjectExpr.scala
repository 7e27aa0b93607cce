package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** PCA projection kernel — the EXACT arithmetic contract of
  * graft.similarity.Pca.pcaProject, which the embedding_pca DuckDB
  * twin replays term-for-term: each output coordinate is
  *
  *   round( Σ_j decimal9( round9( w_j · (x_j − μ_j) ) ), 6 )
  *
  * where round9 is Spark's Round-on-double (HALF_UP on the SHORTEST
  * DECIMAL representation — java BigDecimal.valueOf semantics, NOT
  * binary-value rounding: 4.9999…e-10 whose shortest repr is 5.0E-10
  * rounds UP), decimal9 re-reads that double at scale 9 (Spark's
  * double→decimal(28,9) cast — identity for |t| < 1e6 by the ≤15
  * significant-digit round-trip guarantee, kept anyway for
  * bit-faithfulness), and the sum is EXACT over scaled-long unscaled
  * values (addition-order-free, so the projection is deterministic
  * under any layout).
  *
  * Why an expression: the declarative form is k higher-order
  * F.aggregate folds over decimal(30,9) — k·d interpreted lambda
  * frames and Decimal allocations per row, which dominated the
  * PCA-composed index builds. This kernel runs the identical chain in
  * one JVM loop per row and stays inside WholeStageCodegen (the
  * shared addReferenceObj pattern — no CodegenFallback).
  */
case class PcaProjectExpr(child: Expression,
                          mu: Array[Double],
                          comps: Array[Array[Double]])
    extends UnaryKernelCodegen {
  require(comps.forall(_.length == mu.length),
    "every component must have the mean's dimension")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  private lazy val isFloatArr = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  def kernel(v: ArrayData): ArrayData = {
    import java.math.{BigDecimal => JBD, BigInteger, RoundingMode}
    // a vector shorter than the training dimension is malformed input
    // — refuse loudly (the CovUpperSumAgg discipline) instead of
    // silently truncating to a plausible-looking projection; the
    // declarative chain this kernel replaced nulled such rows, and a
    // codegen kernel cannot express a null result, so the loud arm of
    // that contract is the safe one (r18 ADVICE)
    if (v.numElements() < mu.length)
      throw new IllegalArgumentException(
        s"pca_project: vector has ${v.numElements()} elements, " +
          s"training dimension is ${mu.length}")
    val d = mu.length
    // center once per row, shared by all k coordinates
    val cx = new Array[Double](d)
    var i = 0
    while (i < d) {
      val x: Double = if (isFloatArr) v.getFloat(i).toDouble else v.getDouble(i)
      cx(i) = x - mu(i)
      i += 1
    }
    val out = new Array[Any](comps.length)
    var c = 0
    while (c < comps.length) {
      val w = comps(c)
      var acc = 0L // unscaled decimal(·,9) accumulator — exact
      var j = 0
      while (j < d) {
        val t = w(j) * cx(j)
        if (t != 0.0) acc = Math.addExact(acc, roundToUnscaled(t, 1e9, 9))
        j += 1
      }
      // Cast(decimal(·,9) → double): correctly rounded acc·10⁻⁹ —
      // exact-long acc over exact-constant 1e9 is the same correctly
      // rounded quotient IEEE division produces
      val asD =
        if (math.abs(acc) < (1L << 53)) acc.toDouble / 1e9
        else new JBD(BigInteger.valueOf(acc), 9).doubleValue()
      // Round(double, 6), then the long→double read at scale 6
      val r6 = roundToUnscaled(asD, 1e6, 6)
      out(c) =
        if (math.abs(r6) < (1L << 53)) r6.toDouble / 1e6
        else JBD.valueOf(asD).setScale(6, RoundingMode.HALF_UP).doubleValue()
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Unscaled value of Spark's Round(double, scale) → decimal(·,scale)
    * chain (shortest-decimal HALF_UP, re-read through double). Fast
    * path: the chain equals plain floor(+carry) of t·10^scale whenever
    * the scaled value sits clear of a .5 rounding boundary — the
    * shortest-decimal repr of t differs from t's binary value by
    * < ulp(t), and the t·10^scale product adds another half-ulp, so a
    * boundary can only flip inside a conservatively padded window
    * (|s|·1e-13 + 1e-9 ≫ the true ~|s|·1.1e-16 slack; integer-crossing
    * slack provably never changes the rounded result, only the .5
    * boundary does). Near a boundary — or past 9e13 where the ≤15
    * significant-digit double round-trip guarantee runs out — take
    * the exact BigDecimal chain.
    */
  private def roundToUnscaled(t: Double, pow: Double, scale: Int): Long = {
    val s = t * pow
    val as = math.abs(s)
    if (as < 9e13) {
      val fl = math.floor(s)
      val frac = s - fl
      val guard = as * 1e-13 + 1e-9
      if (math.abs(frac - 0.5) > guard)
        return fl.toLong + (if (frac > 0.5) 1L else 0L)
    }
    import java.math.{BigDecimal => JBD, RoundingMode}
    val r = JBD.valueOf(t).setScale(scale, RoundingMode.HALF_UP)
    JBD.valueOf(r.doubleValue()).setScale(scale, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProjectExpr =
    copy(child = newChild)
}

object PcaProjectExpr {
  /** Column wrapper: the k projection coordinates of the vector under
    * (mu, comps) — Pca.pcaProject's oracle-pinned arithmetic.
    */
  def pcaProject(vec: Column, mu: Seq[Double], comps: Seq[Seq[Double]]): Column =
    Bridge.column(PcaProjectExpr(Bridge.expression(vec),
      mu.toArray, comps.map(_.toArray).toArray))
}
