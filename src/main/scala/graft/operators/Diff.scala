package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Row-level diff between two snapshots of a keyed table — the
  * data-diff audit every migration/backfill/CDC pipeline wants before
  * it promotes a new snapshot: how many rows appeared, vanished, or
  * changed, and WHICH columns drive the changes. Complements
  * [[graft.sources.Sources.schemaDrift]] (the schema-level diff) and
  * the SCD machinery (which APPLIES changes; this MEASURES them).
  */
object Diff {

  /** Compare `before` and `after` on `keyCols`. Returns a small
    * integer report, one row per metric:
    *
    *   (kind, n): rows_before, rows_after, added (key only in after),
    *   removed (key only in before), changed (key in both, any
    *   non-key column differs), unchanged, and one `col:<name>` row
    *   per non-key column counting rows where THAT column differs
    *   (a changed row can count toward several columns).
    *
    * Comparison is null-safe equality (`<=>` / IS NOT DISTINCT FROM
    * in the SQL twin) on the raw column values — no casts, so doubles
    * compare bit-for-bit and decimals by value, cross-engine.
    *
    * Scale: ONE full-outer equi-join on the key (co-partitioned by
    * the shuffle; at warehouse scale both snapshots bucket by the
    * same key and the join is shuffle-free) + ONE aggregate — only
    * the fixed-width flag vector moves past the join; the report is
    * |columns|+6 rows. Keys must be unique per snapshot (it's a
    * snapshot diff, not a multiset diff): duplicate keys would
    * cross-multiply in the join, so the caller dedups first.
    */
  def tableDiff(before: DataFrame, after: DataFrame,
                keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val cols = before.columns.toSeq
    require(after.columns.toSeq == cols,
      "snapshots must share a schema (run schemaDrift for evolved tables)")
    val valCols = cols.filterNot(keyCols.contains)
    // Explicit presence sentinels: the join matches null keys with <=>
    // (so a NULL key CAN pair), which means key-column nullness cannot
    // signal side presence — a row whose leading key is NULL would be
    // counted in no bucket. A constant true column per side is
    // null-key-proof: it is null after the outer join iff the side is
    // genuinely absent.
    val a = before.select(cols.map(F.col) :+ F.lit(true).as("__in_a"): _*).as("a")
    val b = after.select(cols.map(F.col) :+ F.lit(true).as("__in_b"): _*).as("b")
    val joined = a.join(b, keyCols.map(k =>
        F.col(s"a.$k") <=> F.col(s"b.$k")).reduce(_ && _), "full_outer")
    val inA = F.col("a.__in_a").isNotNull
    val inB = F.col("b.__in_b").isNotNull
    val colDiff = valCols.map(c =>
      c -> (inA && inB && !(F.col(s"a.$c") <=> F.col(s"b.$c"))))
    val anyDiff =
      if (colDiff.isEmpty) F.lit(false)
      else colDiff.map(_._2).reduce(_ || _)
    def cnt(p: org.apache.spark.sql.Column) =
      F.sum(F.when(p, 1L).otherwise(0L))
    val aggCols = Seq(
      cnt(inA).as("rows_before"),
      cnt(inB).as("rows_after"),
      cnt(!inA && inB).as("added"),
      cnt(inA && !inB).as("removed"),
      cnt(inA && inB && anyDiff).as("changed"),
      cnt(inA && inB && !anyDiff).as("unchanged")) ++
      colDiff.map { case (c, p) => cnt(p).as(s"col:$c") }
    val agg = joined.agg(aggCols.head, aggCols.tail: _*)
    val metrics = Seq("rows_before", "rows_after", "added", "removed",
      "changed", "unchanged") ++ valCols.map(c => s"col:$c")
    // one row -> |metrics| rows via a literal stack (driver-free)
    agg.select(F.explode(F.array(metrics.map(m =>
        F.struct(F.lit(m).as("kind"), F.col(s"`$m`").as("n"))): _*))
        .as("kv"))
      .select(F.col("kv.kind").as("kind"), F.col("kv.n").as("n"))
  }
}
