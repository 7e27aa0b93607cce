package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage pinning for iterative loops — one shared implementation of
  * the per-round checkpoint/localCheckpoint pattern (the pageRank
  * plan-explosion fix) PLUS its missing half: deterministic release.
  *
  * `Dataset.unpersist()` only clears CacheManager entries (frames
  * pinned via `persist()`); an eager `localCheckpoint` parks its
  * MEMORY_AND_DISK blocks behind a `LogicalRDD` leaf that the
  * CacheManager never sees, so per-round `unpersist()` calls in a loop
  * are silent no-ops and every round's blocks linger until the
  * ContextCleaner happens to GC the RDD object — which a tight
  * iterative loop (5-8 rounds before any GC) easily outruns. At
  * cluster scale that is `rounds × |frontier|` of dead blocks
  * competing with the live working set.
  */
object Pins {

  /** Eager lineage pin: a reliable checkpoint when the session has a
    * checkpoint dir (cluster deployments — survives executor loss),
    * else an eager localCheckpoint (single-JVM runs, where losing an
    * executor means losing the app anyway). Plain persist() is NOT
    * enough for a frame referenced more than once per round: the
    * logical plan doubles every iteration even though execution reads
    * the cache.
    */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)

  /** Release a pinned (or persisted) frame's storage NOW. Walks the
    * analyzed plan for `LogicalRDD` leaves and unpersists their
    * backing RDDs directly — the blocks a localCheckpoint holds are
    * invisible to `Dataset.unpersist()`. The frame's data is
    * unrecoverable afterwards (its lineage was truncated at the pin),
    * so only release a round once its successor is eagerly pinned.
    * Reliable-checkpoint frames keep their checkpoint-dir files (the
    * RDD unpersist is a no-op there); persist()-backed frames release
    * through the plain unpersist.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
  }
}
