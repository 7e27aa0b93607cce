package graft

import org.apache.spark.sql.SparkSession

/** Tuned local SparkSession factory.
  *
  * Settings chosen for the 100 TB design point (AQE for runtime
  * re-planning / skew splitting, shuffle partitions sized to cores in
  * local mode — on a real cluster this would be ~2-3x total cores).
  */
object GraftSession {
  /** @param checkpointDir optional RELIABLE checkpoint location
    *        (HDFS/object-store path on a cluster). When set,
    *        lineage-truncating operators (Dedup.components) take the
    *        `checkpoint()` branch, so an executor loss re-reads pinned
    *        labels instead of silently re-running a released upstream
    *        pipeline; unset (the single-JVM default) they fall back to
    *        an eager localCheckpoint. Also settable via the
    *        SPARK_GRAFT_CHECKPOINT_DIR env var — cluster deployments
    *        should set one of the two.
    */
  def build(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
            appName: String = "graft",
            checkpointDir: Option[String] =
              sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions) // SQL access to native kernels
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    spark
  }
}

/** Lazy parquet loaders for the driver-generated star schema
  * (see /root/repo/TESTDATA.md).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def load(name: String) = spark.read.parquet(s"$dir/$name.parquet")
  lazy val region     = load("region")
  lazy val nation     = load("nation")
  // SPREAD tables (r20, guide §2.5 — see Tables.spread): customer,
  // part, documents and embeddings feed per-row CPU kernels in nearly
  // every consumer (levenshtein/JW linkage and value matching on
  // names, shingling/tokenizing, codec decodes, vector math), so the
  // single-split serial scan was their bottleneck — measured wins of
  // 1.5-6x per query (er_resolve 5.5→1.7 s, multimodal_image_
  // phash_dedup 3.3→0.6 s). lineitem/orders/events stay UNSPREAD at
  // load: their consumers are mostly shuffle-bound aggregates where a
  // blanket exchange degrades map-side partial aggregation (measured
  // +0.5-1.0 s per query across ~20 relational rows); the handful of
  // genuinely scan-CPU-bound consumers spread at THEIR call sites.
  lazy val customer   = Tables.spread(load("customer"))
  lazy val supplier   = load("supplier")
  lazy val part       = Tables.spread(load("part"))
  lazy val orders     = load("orders")
  lazy val lineitem   = load("lineitem")
  // events.ts has shipped as parquet TIMESTAMP(NANOS) in some rounds
  // (Spark has no nanos type — read as raw longs via the legacy conf
  // and floor to micros, like DuckDB's epoch_us truncation) and as
  // TIMESTAMP(MICROS) in others (r10 regeneration — arrives as
  // TIMESTAMP_NTZ). Normalize BOTH layouts to the session-TZ (UTC)
  // TimestampType every query compares against; dispatch on the
  // INFERRED type, never on an assumed layout. The conf toggle is
  // session-GLOBAL and schema inference happens inside load(), so
  // concurrent events loads (parallel test suites on the shared
  // session) serialize through one lock.
  lazy val events = Tables.nanosLock.synchronized {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import org.apache.spark.sql.{functions => F}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load("events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos
        raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case TimestampNTZType => // TIMESTAMP(MICROS), no UTC flag
        // session TZ is UTC, so this cast reinterprets the same micros
        // as the LTZ instant DuckDB's naive reading compares equal to
        raw.withColumn("ts", F.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  lazy val documents  = Tables.spread(load("documents"))
  lazy val embeddings = Tables.spread(load("embeddings"))
}

object Tables {
  /** Scale-adaptive read parallelization (optimization guide §2.5:
    * "input skew — one huge unsplittable file ... otherwise
    * repartition immediately after the read"). The test corpus ships
    * each table as ONE single-row-group parquet file, so every scan
    * plans exactly ONE task and ALL map-side work — tokenizing,
    * shingling, string kernels, codecs, per-row scoring — runs
    * serially no matter how many cores the session has (measured:
    * q1_agg spent 1.7 s of its 2.2 s wall in a single scan task;
    * er_resolve ran its ~1.8M levenshtein candidates in 2 tasks).
    *
    * When a scan plans fewer partitions than the session's
    * parallelism AND the file is big enough to matter (>= 100 KB),
    * redistribute once right after the read. The condition derives
    * from the ACTUAL file layout: on a production deployment (splits
    * >= cores) it is a NO-OP, so this is not a local-mode constant —
    * it is the guide's documented remedy for unsplittable inputs.
    * Filters and column pruning still push past the repartition to
    * the scan (verified via explain: PushedFilters/ReadSchema
    * unchanged). APPLIED SELECTIVELY, not on every load: a blanket
    * exchange taxes shuffle-bound consumers (worse map-side partial
    * aggregation, measured +0.5-1.0 s/query on the relational suite),
    * so only the kernel-heavy tables spread at load and a few
    * scan-CPU-bound queries spread at their call sites. Opt-out:
    * SPARK_GRAFT_SPREAD_INPUT=0.
    */
  private val spreadInput: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_SPREAD_INPUT", "1") != "0"
  private val SpreadMinBytes = 100L * 1024
  private[graft] def spread(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    if (!spreadInput) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < SpreadMinBytes ||
        df.rdd.getNumPartitions >= p) df
    else {
      // HASH repartition on every column, not round-robin: a keyless
      // repartition(n) first locally SORTS its input so retried tasks
      // reproduce the same row→partition map (SPARK-23207, guide
      // §2.5) — measured at ~+0.7-1.0 s per query on these tables.
      // Hashing the full row is retry-deterministic without the sort,
      // and real tables have plenty of distinct tuples so the spread
      // is even.
      import org.apache.spark.sql.{functions => F}
      df.repartition(p, df.columns.map(F.col).toIndexedSeq: _*)
    }
  }

  /** Serializes the nanosAsLong conf toggle in [[Tables.events]] —
    * one JVM-wide lock because the conf is per-session and the test
    * session is shared across concurrently-running suites.
    */
  private[graft] val nanosLock = new Object
}
