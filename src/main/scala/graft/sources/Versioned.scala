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
             format: String = "parquet"): Long =
    commitAs(df, root, currentVersion(df.sparkSession, root).getOrElse(0L) + 1L,
      format)

  /** Commit `df` as a SPECIFIC version (the retry/race surface:
    * a writer that recomputes the same target version after a failure
    * gets a loud `concurrent commit` error if someone else won). The
    * promote protocol never deletes a MARKED data dir and re-checks
    * the marker around every step, so a winner's committed data
    * survives every race this protocol can detect; on filesystems
    * without atomic rename-no-overwrite a residual window remains
    * (see the inline commentary) — single-writer is the supported
    * contract, concurrent commits are detected best-effort-loudly.
    */
  def commitAs(df: DataFrame, root: String, next: Long,
               format: String = "parquet"): Long = {
    val spark = df.sparkSession
    val dataDir = new Path(root, s"v_$next")
    val marker = new Path(new Path(root, "_commits"), next.toString)
    val fs = fsOf(spark, marker)
    // Stage-then-rename, never a direct overwrite of v_N: a loser in
    // a same-version race must NOT clobber the winner's
    // already-committed data before its own marker create fails.
    // Writing to a uuid-suffixed staging dir keeps racing writers on
    // disjoint paths; the marker check below then refuses to promote
    // once v_N is committed, and a crashed writer's MARKER-LESS v_N
    // leftover (invisible by contract) is the only thing reclaimed.
    // Staging leftovers from crashes are swept by [[vacuum]].
    val staging = new Path(root,
      s"v_$next.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.format(format)
      .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .save(staging.toString)
    def abort(msg: String): Nothing = {
      fs.delete(staging, true)
      throw new IllegalStateException(msg)
    }
    def committedByOther(): Nothing = abort(
      s"concurrent commit: version $next at $root was committed by " +
        "another writer (committed data left untouched)")
    // Promote WITHOUT pre-deleting v_N: a committed winner's data dir
    // is never deleted on any path below — the only delete targets an
    // UNMARKED leftover, with the marker re-checked immediately before.
    // Residual window (documented, not closed): on a filesystem whose
    // rename is not atomic-no-overwrite, a racer can slip between the
    // final marker re-check and our rename; the nested-dir check below
    // detects the rename-into-existing-dir shape and restores, but a
    // true simultaneous swap on a non-transactional store remains
    // best-effort-LOUD, not serializable. Single-writer is the
    // supported contract; races are detected, not arbitrated.
    if (fs.exists(marker)) committedByOther()
    def tryPromote(): Boolean = !fs.exists(dataDir) && fs.rename(staging, dataDir)
    if (!tryPromote()) {
      // rename refused: either a winner committed (marker) or a crashed
      // writer's marker-LESS leftover occupies v_N (invisible by
      // contract — reclaim it and retry once)
      if (fs.exists(marker)) committedByOther()
      if (fs.exists(dataDir)) {
        if (fs.exists(marker)) committedByOther() // re-check at the delete
        fs.delete(dataDir, true)
      }
      if (!tryPromote()) {
        if (fs.exists(marker)) committedByOther()
        abort(s"concurrent commit: could not promote staging dir to $dataDir")
      }
    }
    // post-rename adjudication: Hadoop rename moves src INTO an
    // existing dst dir — if a racer promoted v_N between our exists
    // check and rename, our data landed NESTED under theirs; remove
    // only our nested dir (their committed tree untouched) and abort
    val nested = new Path(dataDir, staging.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      fs.delete(staging, true)
      throw new IllegalStateException(
        s"concurrent commit: lost the promote race for version $next at " +
          s"$root (winner's committed data left untouched)")
    }
    if (fs.exists(marker)) committedByOther()
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
    * but invisible directory, cleaned by the next vacuum). Also
    * reclaims marker-LESS v_* directories older than the newest kept
    * committed version: a crash between vacuum's marker delete and
    * data delete (or a writer crash mid-write) leaves exactly that
    * shape, and deriving the drop list solely from surviving markers
    * would leak it forever. Returns the removed version numbers.
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
    // orphan sweep: data dirs below the newest KEPT committed version
    // with no marker are invisible forever (readers resolve versions
    // from markers only) — reclaim them. Dirs ABOVE it are left
    // alone: they may be an in-flight writer's next version.
    val keptMax = vs.takeRight(keep).lastOption.getOrElse(Long.MinValue)
    val orphans = fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
      .flatMap(s => scala.util.Try(s.getPath.getName.drop(2).toLong).toOption)
      .filter(v => v < keptMax && !fs.exists(new Path(dir, v.toString)))
    orphans.foreach(v => fs.delete(new Path(root, s"v_$v"), true))
    // staging sweep: v_N.tmp-<uuid> dirs from crashed commits are dead
    // once version N is committed or superseded (N <= newest kept);
    // later-N staging dirs may belong to an in-flight writer — leave
    // them for a future vacuum.
    fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.matches("v_\\d+\\.tmp-.*"))
      .filter(s => s.getPath.getName.drop(2)
        .takeWhile(_.isDigit).toLong <= keptMax)
      .foreach(s => fs.delete(s.getPath, true))
    (drop ++ orphans).distinct.sorted
  }
}
