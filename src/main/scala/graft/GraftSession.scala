package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's tuned defaults.
  *
  * The reference (uk27/MapReduce-Framework-For-MergeSort) exposes two physical
  * knobs: `chunkSize` (bytes per map task, `Client.java:21`) and `mergeJobs`
  * (merge fan-in, `Server.java:300`). Their Spark equivalents are
  * `spark.sql.files.maxPartitionBytes` (scan split size) and
  * `spark.sql.shuffle.partitions` (reduce fan-in); both are set here and
  * overridable per-session. Fault tolerance (the bulk of the reference's code:
  * heartbeats `Server.java:588-650`, retry `Server.java:183-188`, speculation
  * `Server.java:194-259`) maps to Spark conf, not code: `spark.task.maxFailures`,
  * `spark.speculation`, `spark.network.timeout`.
  *
  * Scale notes (100 TB / 1000 executors): AQE is on so skewed shuffles re-plan
  * at runtime (`skewJoin`, partition coalescing); shuffle partition count here
  * is a local[32] default — a real cluster wants ~2-3x total cores or AQE's
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` sized to
  * data/128MB.
  */
object GraftSession {

  def builder(
      master: String = "local[32]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // engine extensions: codegen'd vector kernels (GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // bucketed-table demos write here, never into the repo working dir
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Shuffles START at 8x the base partition count and AQE coalesces
      // DOWN to the advisory size — without this, `shuffle.partitions` is a
      // hard ceiling AQE can never raise, and any shuffle whose data
      // outgrows base-count × executor-memory spills (measured: the 100x
      // q_dedup_jaccard postings shuffle went super-linear at 32
      // partitions). At small SF the coalesce collapses the extra
      // partitions, so local runs keep their plans; override via
      // SPARK_GRAFT_INIT_PARTITIONS (a real cluster wants ~data/128MB).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS",
          (shufflePartitions * 8).toString))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries ns-precision timestamps, which Spark's parquet
      // reader rejects ([PARQUET_TYPE_ILLEGAL]); read them as raw nano longs
      // and convert explicitly (EventOps.normalizeTs).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirrors the reference's task retry (`Server.java:183-188`)
      .config("spark.task.maxFailures", "4")
      // mirrors the reference's proactive redundant execution
      // (`Server.java:194-259,431-508`: same task on NumForRedundantTasks
      // nodes, first winner kills the rest). Spark's version is reactive —
      // only stragglers past the quantile/multiplier get a second copy —
      // which the reference's own Performance Evaluation argues for: its
      // proactive mode measured ~3x SLOWER than single-fault mode (PDF p.4).
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "3")
      .config("spark.speculation.quantile", "0.9")

  def get(): SparkSession = builder().getOrCreate()

  /** Load one of the standard test tables from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
