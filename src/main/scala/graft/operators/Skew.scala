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
    *
    * `rowSalt = false` (default) salts by hashing the left row's
    * CONTENT — fully deterministic across runs and retries, but rows
    * with identical values share a salt, so a pathological corpus of
    * verbatim duplicates still lands on one reducer. `rowSalt = true`
    * salts by POSITION instead (partition ordinal + partition-local
    * index): still deterministic for a fixed input partitioning — the
    * two ids are pure functions of (file split, row offset), stable
    * across retries of the same plan — and it splits duplicate-
    * identical rows `salts` ways too.
    */
  private[graft] def saltColumn(left: DataFrame, salts: Int,
                                rowSalt: Boolean): org.apache.spark.sql.Column =
    if (rowSalt)
      // monotonically_increasing_id = (partition ordinal << 33) |
      // partition-local counter: consecutive duplicates get
      // consecutive ids, so pmod spreads them round-robin
      F.pmod(F.monotonically_increasing_id(), F.lit(salts.toLong)).cast("int")
    else
      F.pmod(F.xxhash64(left.columns.toSeq.map(F.col): _*), F.lit(salts)).cast("int")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
                 rowSalt: Boolean = false): DataFrame = {
    require(salts >= 1)
    val l = left.withColumn("_salt", saltColumn(left, salts, rowSalt))
    val r = right.withColumn("_salt",
      F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
