package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.operators.Ranks

/** Ranks.globalRank must agree bit-for-bit with the single-partition
  * `row_number().over(Window.orderBy(...))` it replaces — same Spark
  * SQL ordering semantics (binary string comparison, NaN-last
  * doubles), exact offsets across partitions, stable under recompute.
  */
class RanksSpec extends SparkSpec {

  private def windowRank(df: org.apache.spark.sql.DataFrame,
                         order: Seq[org.apache.spark.sql.Column]) =
    df.withColumn("wrk", F.row_number().over(Window.orderBy(order: _*)).cast("long"))

  test("globalRank == global-window row_number on doubles (multi-partition)") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 7919 % 500).toDouble / 3.0)).toDF("value")
      .distinct().repartition(5)
    val got = Ranks.globalRank(df, Seq(F.col("value").asc), parts = 4)
    val want = windowRank(df, Seq(F.col("value").asc))
    assert(got.join(want, "value")
      .where(F.col("rnk") =!= F.col("wrk")).count() == 0)
    assert(got.count() == df.count())
  }

  test("globalRank == global-window row_number on strings incl. non-ASCII") {
    import spark.implicits._
    val df = Seq("b", "a", "B", "~", "é", "ß", "zz", "z", "0", " ", "中")
      .toDF("value").repartition(3)
    val got = Ranks.globalRank(df, Seq(F.col("value").asc), parts = 3)
    val want = windowRank(df, Seq(F.col("value").asc))
    assert(got.join(want, "value")
      .where(F.col("rnk") =!= F.col("wrk")).count() == 0)
  }

  test("globalRank: multi-column order with tie-break, desc, exact ntile replay") {
    import spark.implicits._
    // heavy ties on score — the id tie-break makes the order total
    val df = (1L to 97L).map(i => (i, (i % 5).toDouble)).toDF("id", "score")
    val order = Seq(F.col("score").desc, F.col("id").asc)
    val got = Ranks.globalRank(df, order, parts = 4)
    val want = windowRank(df, order)
    assert(got.join(want, Seq("id"))
      .where(F.col("rnk") =!= F.col("wrk")).count() == 0)
    // closed-form ntile from (rnk, n, b) must equal F.ntile over the
    // same order — the qualityBuckets contract (97 = 3*32 + 1: first
    // bucket gets 33)
    val b = 3
    val n = got.agg(F.max("rnk").as("__n"))
    val formula = got.crossJoin(F.broadcast(n))
      .withColumn("__q", F.expr(s"__n div $b"))
      .withColumn("__r0", F.expr(s"__n - __q * $b"))
      .withColumn("bucket",
        F.expr(s"""CASE WHEN rnk <= __r0 * (__q + 1)
                   THEN (rnk - 1) div (__q + 1) + 1
                   ELSE __r0 + (rnk - __r0 * (__q + 1) - 1) div greatest(__q, 1L) + 1
                   END""").cast("long"))
    val ntile = df.withColumn("bucket2",
      F.ntile(b).over(Window.orderBy(order: _*)).cast("long"))
    assert(formula.join(ntile, Seq("id"))
      .where(F.col("bucket") =!= F.col("bucket2")).count() == 0)
  }

  test("globalRank: empty input and single row") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("value")
    assert(Ranks.globalRank(empty, Seq(F.col("value").asc)).count() == 0)
    val one = Seq(42.0).toDF("value")
    val r = Ranks.globalRank(one, Seq(F.col("value").asc)).collect()
    assert(r.length == 1 && r(0).getLong(1) == 1L)
  }
}
