package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering — the write-side optimization that makes 100 TB
  * scans cheap. A table sorted on one column prunes row groups only for
  * predicates on that column; interleaving the bits of TWO columns into one
  * Morton (z-order) value and range-partitioning + sorting by it gives every
  * written file a tight min/max envelope on BOTH columns, so parquet
  * row-group stats prune scans on either predicate (the public technique
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`). The reference has no layout
  * surface at all (single sort key, `ServerHandler.java:23-80`); this is the
  * multi-dimensional generalization of its total sort.
  *
  * All arithmetic is exact integer (subtract, multiply, `div`, shift, mask):
  * the same expressions evaluate bit-identically in DuckDB, so the bucket
  * stats query is oracle-verifiable. Values normalize to 16 bits per
  * dimension via `((x - min) * 65535) div span` — exact while
  * `(max-min) * 65535 < 2^63`, i.e. any realistic key domain.
  */
object LayoutOps {

  /** Normalized 16-bit bucket of column `c` given bounds columns `lo`/`hi`
    * (all plain column names — the expression is integer-exact SQL shared
    * verbatim with the oracle).
    */
  private def norm16(c: String, lo: String, hi: String): Column =
    expr(s"(($c - $lo) * 65535) div greatest($hi - $lo, 1)")

  /** Morton interleave of two 16-bit values into a 32-bit z-value: bit i of
    * x lands at 2i, bit i of y at 2i+1. The 32 addends occupy disjoint
    * bits, so `+` is exact (it IS the bitwise OR).
    */
  def interleave16(xb: Column, yb: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** DuckDB fragment matching [[interleave16]] (`xb`/`yb` spliced per bit —
    * pass plain column references).
    */
  def interleave16Sql(xb: String, yb: String): String =
    ((0 until 16).map(i => s"((($xb >> $i) & 1) << ${2 * i})") ++
      (0 until 16).map(i => s"((($yb >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")

  /** Rows with their z-value: one 4-cell bounds aggregate broadcast back
    * into the scan (the [[StatsOps.histogram]] / range-sampler shape), then
    * a pure projection.
    */
  def withZ(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("__xlo"), max(col(xCol)).as("__xhi"),
      min(col(yCol)).as("__ylo"), max(col(yCol)).as("__yhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", interleave16(
        norm16(xCol, "__xlo", "__xhi"),
        norm16(yCol, "__ylo", "__yhi")))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** Cluster the table for writing: range-partition on the z-value (each
    * output file owns a contiguous z-range ⇒ a small rectangle of (x, y)
    * space) and sort within partitions so row groups nest the same way.
    * This is the layout a writer would `.write.parquet(...)` — the spec
    * asserts the per-partition extent shrinkage that makes stats pruning
    * work.
    */
  def zorderRepartition(df: DataFrame, xCol: String, yCol: String, numPartitions: Int): DataFrame =
    withZ(df, xCol, yCol)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))

  /** Small-files compaction plan — the `OPTIMIZE`-style maintenance step a
    * 100 TB table needs continuously: for each partition, estimate its bytes
    * from a size-proxy column and emit how many target-sized files the
    * partition should compact into and the rows-per-file split. The output
    * IS the repartition spec a writer would execute
    * (`df.where(part).repartition(n_files).write`): planning is a metadata
    * aggregation, never a data rewrite, so it costs one partial+final
    * aggregate over the table regardless of scale.
    *
    * All arithmetic is integer ceiling division (`(a + b - 1) div b`) —
    * bit-identical in DuckDB, so the plan is oracle-verifiable. Empty
    * estimates still get one file (`greatest(1, ...)`).
    */
  def compactionPlan(
      df: DataFrame,
      partCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame =
    df.groupBy(col(partCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(bytesCol)).cast("long").as("est_bytes"))
      .withColumn("n_files",
        greatest(lit(1L), expr(s"(est_bytes + ${targetBytes - 1}) div $targetBytes")))
      .withColumn("rows_per_file", expr("(n_rows + n_files - 1) div n_files"))
      .orderBy(col(partCol))

  /** The data-rewrite half of [[compactionPlan]] — Delta/Iceberg
    * `OPTIMIZE` over a plain parquet directory: list the part-files,
    * derive the target file count from real on-disk bytes (the same
    * ceiling division as the plan), and rewrite as that many evenly-sized
    * files. Returns the file count written.
    *
    * Scale shape: the listing is driver-side metadata — one status call
    * per file, exactly the information a table format keeps in its
    * manifest, never a data read. The rewrite is one round-robin
    * `repartition(n)` (skew-free by construction: assignment ignores
    * keys) feeding the parquet writer. The natural producer of the small
    * files is streaming ingest — one file per microbatch per partition —
    * and StreamingOpsSpec drives exactly that loop end-to-end.
    */
  def compactParquet(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long): Long = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(path)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    spark.read.parquet(inDir)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Locality audit: bucket the z-space and report each bucket's row count
    * and (x, y) envelope — tight envelopes on BOTH dimensions are the
    * pruning guarantee. `nBuckets` must divide 2^32.
    */
  def zorderStats(df: DataFrame, xCol: String, yCol: String, nBuckets: Int): DataFrame = {
    val bucketWidth = (1L << 32) / nBuckets
    withZ(df, xCol, yCol)
      .withColumn("zbucket", expr(s"__z div $bucketWidth"))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
      .orderBy(col("zbucket"))
  }
}
