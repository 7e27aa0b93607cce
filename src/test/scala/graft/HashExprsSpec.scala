package graft

import graft.functions.HashExprs
import org.apache.spark.sql.{functions => F}

class HashExprsSpec extends SparkSpec {
  import spark.implicits._

  test("minhashSig: length, determinism, and containment monotonicity") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")), // identical shingles
      (3L, Seq("x y z"))
    ).toDF("id", "shs")
    val out = df.select($"id", HashExprs.minhashSig($"shs", 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).length == 16)
    assert(out(1L) == out(2L), "identical input must give identical signature")
    assert(out(1L) != out(3L))
  }

  test("minhashSig: signature agreement estimates Jaccard") {
    // two docs sharing 90% of shingles should agree on most components
    val base = (0 until 100).map(i => s"sh$i")
    val df = Seq((1L, base), (2L, base.drop(10) ++ (0 until 10).map(i => s"zz$i")))
      .toDF("id", "shs")
    val out = df.select($"id", HashExprs.minhashSig($"shs", 128).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val agree = out(1L).zip(out(2L)).count { case (a, b) => a == b }
    // true Jaccard = 90/110 ≈ 0.818; 128 samples → expect agreement well above half
    assert(agree > 64, s"agreement $agree/128 too low for J≈0.82")
  }

  test("winnowMins matches brute-force sliding minima") {
    val hs = Seq(5L, 3L, 8L, 1L, 9L, 2L)
    val w = 3
    val brute = (0 to hs.length - w).map(i => hs.slice(i, i + w).min).distinct.sorted
    val got = Seq(Tuple1(hs)).toDF("hs")
      .select(HashExprs.winnowMins($"hs", w).as("m"))
      .as[Seq[Long]].head()
    assert(got == brute)
  }

  test("winnowMins: short and empty inputs") {
    val got = Seq(Tuple1(Seq(7L, 4L)), Tuple1(Seq.empty[Long]))
      .toDF("hs").select(HashExprs.winnowMins($"hs", 3).as("m"))
      .as[Seq[Long]].collect()
    assert(got(0) == Seq(4L), "n < w keeps the global minimum")
    assert(got(1).isEmpty)
  }

  test("charEntropy: known distributions, ordered-sum determinism, degenerate inputs") {
    import graft.functions.HashExprs
    def ent(s: String): Double = {
      val df = Seq(Tuple1(s)).toDF("t")
      df.select(HashExprs.charEntropy(F.col("t"))).as[Double].collect().head
    }
    // uniform over 4 chars -> ln(4); single char class -> exactly +0.0
    assert(math.abs(ent("abcd") - math.log(4)) < 1e-12)
    assert(java.lang.Double.doubleToRawLongBits(ent("aaaa")) == 0L,
      "zero entropy must be +0.0, not -0.0")
    assert(ent("") == 0.0)
    // "aab": -(2/3 ln 2/3 + 1/3 ln 1/3)
    val expected = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(ent("aab") - expected) < 1e-12)
    // permutations of the same multiset agree bit-for-bit (ordered sum)
    assert(ent("abcabc") == ent("ccbbaa"))
    // supplementary code points count as ONE character each
    assert(math.abs(ent(new String(Character.toChars(0x1F600)) + "a") - math.log(2)) < 1e-12)
  }

  test("cosineSim: known geometry") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 2.0f), Seq(2.0f, 4.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "want")
    val rows = df.select(HashExprs.cosineSim($"a", $"b").as("got"), $"want")
      .as[(Double, Double)].collect()
    rows.foreach { case (got, want) => assert(math.abs(got - want) < 1e-9) }
  }

  test("lshSig: deterministic, in range, similar vectors collide more") {
    val v1 = (0 until 64).map(i => math.sin(i).toFloat)
    val v2 = v1.updated(0, v1(0) + 0.01f) // near-identical
    val v3 = v1.map(x => -x)              // antipodal
    val out = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("id", "v")
      .select($"id", HashExprs.lshSig($"v", 12).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(out.values.forall(s => s >= 0 && s < (1L << 12)))
    val hamming12 = java.lang.Long.bitCount(out(1L) ^ out(2L))
    assert(hamming12 <= 1, s"near-identical vectors differ on $hamming12 planes")
    // antipodal flips every plane whose dot is strictly nonzero
    assert(java.lang.Long.bitCount(out(1L) ^ out(3L)) >= 11)
  }
}
