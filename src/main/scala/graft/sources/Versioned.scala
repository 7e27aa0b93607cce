package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Poor-man's snapshot-isolated table: versioned data directories plus
  * atomic commit markers — the minimal slice of a table format
  * (Iceberg/Delta's core idea) that a 100 TB pipeline needs to
  * REWRITE a table safely while readers are on it:
  *
  *   root/v_3/...parquet      ← immutable version directories
  *   root/_commits/3          ← zero-byte marker, created atomically
  *
  * A version is visible ⟺ its marker exists; `read` resolves the
  * HIGHEST committed version. Because marker creation is a single
  * atomic create-no-overwrite (and data files are never mutated), a
  * writer crash mid-write leaves an invisible partial directory, not
  * a corrupt table — and an in-flight reader keeps scanning the old
  * version's files untouched until [[vacuum]]. Single-writer
  * contract: concurrent committers race on the marker create (the
  * loser errors loudly rather than silently last-write-wins).
  */
object Versioned {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version at `root`, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = new Path(root, "_commits")
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).toSeq
        .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Write `df` as the next version of `root` and commit it
    * atomically. Returns the committed version number.
    */
  def commit(df: DataFrame, root: String,
             format: String = "parquet"): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, root).getOrElse(0L) + 1L
    val dataDir = new Path(root, s"v_$next")
    df.write.format(format)
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .save(dataDir.toString)
    val marker = new Path(new Path(root, "_commits"), next.toString)
    val fs = fsOf(spark, marker)
    fs.mkdirs(marker.getParent)
    // atomic create-no-overwrite IS the commit: two racing writers of
    // the same version cannot both succeed
    val out = fs.create(marker, false)
    out.close()
    next
  }

  /** Read the current committed snapshot (optionally a pinned older
    * `version` — time travel within the un-vacuumed window).
    */
  def read(spark: SparkSession, root: String,
           format: String = "parquet",
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    spark.read.format(format).load(new Path(root, s"v_$v").toString)
  }

  /** Drop all committed versions except the newest `keep` (markers
    * first, then data — a crash between the two leaves an orphaned
    * but invisible directory, cleaned by the next vacuum). Returns
    * the removed version numbers.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 1, "must keep at least the current version")
    val dir = new Path(root, "_commits")
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) return Nil
    val vs = fs.listStatus(dir).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .sorted
    val drop = vs.dropRight(keep)
    drop.foreach { v =>
      fs.delete(new Path(dir, v.toString), false)
      fs.delete(new Path(root, s"v_$v"), true)
    }
    drop
  }
}
