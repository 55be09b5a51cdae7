package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over numeric columns (north-star extension; the
  * reference computes no data statistics beyond task-latency averages,
  * `Server.java:240,421`).
  *
  * Everything here is one partial+final hash aggregation plus a 1-row
  * broadcast of the global bounds — no windows, no driver loops — so the
  * shapes hold unchanged at 100 TB.
  */
object StatsOps {

  /** Equi-width histogram: `nb` buckets spanning [min, max] of `valueCol`.
    *
    * Two jobs: a 1-row global min/max aggregate (broadcast back into the
    * scan — the same O(1) driver exchange Spark's own range partitioner
    * performs), then one partial+final count per bucket. Bucket index is
    * `floor((x - min) / width)` clamped to nb-1 so x = max lands in the last
    * bucket; all arithmetic is IEEE multiply/divide/floor, which Spark and
    * DuckDB compute bit-identically (the [[TextOps.roundBp]] rationale), so
    * bucket assignment — and the bp-rounded bucket bounds we emit — is
    * portable across engines.
    *
    * Scale: the histogram itself is `nb` rows of mergeable state (counts add
    * across partitions and across corpus shards) — the fixed-size-summary
    * family next to HLL/CMS in [[SketchOps]].
    */
  def histogram(df: DataFrame, valueCol: String, nb: Int): DataFrame = {
    require(nb > 0, "need at least one bucket")
    val bounds = df.agg(
      min(col(valueCol).cast("double")).as("lo"),
      max(col(valueCol).cast("double")).as("hi"))
    val width = (col("hi") - col("lo")) / lit(nb.toDouble)
    val rawIdx = floor((col(valueCol).cast("double") - col("lo")) / width)
    df.crossJoin(broadcast(bounds))
      .select(
        least(rawIdx, lit(nb - 1).cast("double")).cast("long").as("bucket"),
        col("lo"), width.as("w"))
      .groupBy(col("bucket"), col("lo"), col("w"))
      .agg(count(lit(1)).as("n_rows"))
      .select(
        col("bucket"),
        TextOps.roundBp(col("lo") + col("w") * col("bucket").cast("double")).as("lo_bp"),
        TextOps.roundBp(col("lo") + col("w") * (col("bucket") + 1).cast("double")).as("hi_bp"),
        col("n_rows"))
      .orderBy(col("bucket"))
  }
}
