package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Manual skew mitigation for heavy-hitter join keys.
  *
  * AQE's runtime skew-join splitting (on by default in GraftSession)
  * handles sort-merge skew adaptively; this utility is the explicit
  * form for when the skew is known ahead of time (e.g. a null-heavy or
  * celebrity key at 100 TB): left rows are salted deterministically,
  * the right side is replicated `salts` ways, and the join key becomes
  * (key, salt) — splitting each hot key's rows across `salts`
  * partitions instead of one straggler.
  */
object Skew {

  /** Inner equi-join on `key` with `salts`-way salting. Result equals
    * the unsalted join (verified by spec); cost trades |right| x salts
    * replication for even partitioning of the left side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    val l = left.withColumn("_salt",
      F.pmod(F.xxhash64(left.columns.toSeq.map(F.col): _*), F.lit(salts)).cast("int"))
    val r = right.withColumn("_salt",
      F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
