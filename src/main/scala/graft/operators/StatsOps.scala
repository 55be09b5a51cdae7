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
  /** ANALYZE-style column profile: one row per profiled column with
    * min/max (bp), null count, and EXACT distinct count — the statistics
    * a cost-based optimizer and a data-quality gate both read. One pass
    * over the table: the multi-column `count(distinct)` makes Catalyst
    * plan an Expand (rows x columns map-side fan-out) feeding a single
    * partial+final aggregation — CPU-linear in columns, still one scan,
    * no per-column jobs. At 100 TB the distinct counts would swap to the
    * mergeable HLL registers in [[SketchOps]]; min/max/nulls are already
    * constant-size mergeable state.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      TextOps.roundBp(min(col(c))).as(s"${c}__min"),
      TextOps.roundBp(max(col(c))).as(s"${c}__max"),
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__nd")))
    val stackArgs = cols
      .map(c => s"'$c', ${c}__min, ${c}__max, ${c}__nulls, ${c}__nd")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.length}, $stackArgs) " +
        "AS (col_name, min_bp, max_bp, n_nulls, n_distinct)"))
      .orderBy(col("col_name"))
  }

  def histogram(df: DataFrame, valueCol: String, nb: Int): DataFrame =
    histogramCore(df, valueCol, nb)
      .select(
        col("bucket"),
        TextOps.roundBp(col("lo") + col("w") * col("bucket").cast("double")).as("lo_bp"),
        TextOps.roundBp(col("lo") + col("w") * (col("bucket") + 1).cast("double")).as("hi_bp"),
        col("n_rows"))
      .orderBy(col("bucket"))

  /** (bucket, lo, w, n_rows) with unrounded bounds — the mergeable state
    * [[histogram]] projects to bp and [[histogramQuantiles]] ranks over.
    */
  private def histogramCore(df: DataFrame, valueCol: String, nb: Int): DataFrame =
    histogramCoreWith(df, valueCol, nb,
      df.agg(
        min(col(valueCol).cast("double")).as("lo"),
        max(col(valueCol).cast("double")).as("hi")))

  /** [[histogramCore]] against caller-supplied 1-row bounds (`lo`, `hi` —
    * extra columns are ignored), so a caller that already aggregates the
    * table once can reuse that pass instead of paying a second scan.
    */
  private def histogramCoreWith(
      df: DataFrame, valueCol: String, nb: Int, bounds: DataFrame): DataFrame = {
    require(nb > 0, "need at least one bucket")
    val width = (col("hi") - col("lo")) / lit(nb.toDouble)
    val rawIdx = floor((col(valueCol).cast("double") - col("lo")) / width)
    df.crossJoin(broadcast(bounds.select(col("lo"), col("hi"))))
      .select(
        least(rawIdx, lit(nb - 1).cast("double")).cast("long").as("bucket"),
        col("lo"), width.as("w"))
      .groupBy(col("bucket"), col("lo"), col("w"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Approximate quantiles FROM the histogram — the rank-query member of
    * the sketch family ([[SketchOps]]: HLL = distinct, CMS = frequency,
    * Bloom = membership; this = rank): the histogram's `nb` counters merge
    * across shards by addition, and any snapshot answers any quantile to
    * within one bucket width — where exact `percentile` must shuffle and
    * sort every value. Estimate: linear interpolation inside the first
    * bucket whose cumulative count reaches `q·N` (the equi-width analog of
    * the t-digest/KLL contract, exact enough for operational percentiles).
    *
    * Emits the exact `percentile` beside the estimate so the declared
    * query itself documents the sketch error. That exact baseline is the
    * declared query's dominant cost BY DESIGN (it buffers every value per
    * group — the very thing the sketch exists to avoid; the sketch half
    * alone is one scan plus nb counters). All interpolation arithmetic is
    * plain IEEE multiply/divide replicated in the oracle; outputs are bp
    * longs.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, nb: Int, qs: Seq[Double]): DataFrame = {
    // bounds and the exact baseline share ONE aggregate pass over the
    // table — with separate aggs the query costs three scans, this way
    // two. The shared 1-row state is a driver-local literal (graft.Local),
    // not a lazy persist the caller could never release.
    val boundsExact = graft.Local.localized(df.agg(
      min(col(valueCol).cast("double")).as("lo"),
      max(col(valueCol).cast("double")).as("hi"),
      expr(s"percentile($valueCol, array(${qs.mkString("D, ")}D))").as("ex")))
    val core = histogramCoreWith(df, valueCol, nb, boundsExact)
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // nb rows: the windows here run over counter state, never the data —
    // and n_total comes from the SAME pass (a separate core.agg would
    // re-plan the whole histogram, doubling the table scans)
    val cum = core
      .withColumn("cum", sum(col("n_rows")).over(wCum))
      .withColumn("n_total", sum(col("n_rows")).over(wAll))
    val probes = explode(array(qs.map(q => lit(q)): _*)).as("q")
    val ranked = cum.select(col("*"), probes)
      .withColumn("r", col("q") * col("n_total").cast("double"))
      .filter(col("cum").cast("double") >= col("r"))
    val first = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q")).orderBy(col("bucket"))
    val est = col("lo") + col("w") *
      (col("bucket").cast("double") +
        (col("r") - (col("cum") - col("n_rows")).cast("double")) / col("n_rows").cast("double"))
    val qArr = array(qs.map(q => lit(q)): _*)
    val exact = boundsExact
      .select(posexplode(col("ex")).as(Seq("i", "x")))
      .select(
        TextOps.roundBp(element_at(qArr, col("i") + 1)).as("q_bp"),
        TextOps.roundBp(col("x")).as("exact_bp"))
    ranked
      .withColumn("rn", row_number().over(first))
      .filter(col("rn") === 1)
      .select(TextOps.roundBp(col("q")).as("q_bp"), TextOps.roundBp(est).as("est_bp"))
      .join(broadcast(exact), "q_bp")
      .orderBy(col("q_bp"))
  }
}
