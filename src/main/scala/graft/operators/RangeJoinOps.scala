package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the remaining join kind Spark has no native
  * operator for. A naive `l.join(r, l.t < r.t && r.t <= l.t + W)` plans a
  * per-key nested loop; the shape that survives 100 TB is BUCKETING: both
  * sides keyed by (join key, time div W), the left side exploded to its
  * bucket and the successor bucket (any right row within (t, t+W] lives in
  * one of the two), then a plain equi-join + exact residual filter. The
  * shuffle is one equi-shuffle of 2x left + right, and each right row meets
  * only the left rows of two buckets, not the whole key group.
  */
object RangeJoinOps {

  /** Conversion-window pairs: for events of `leftType`, every `rightType`
    * event of the same user STRICTLY after it and within `windowUs`
    * microseconds. Times compare at µs granularity via
    * [[EventOps.tsMicros]] (encoding-dispatching: ns-long fixtures
    * truncate, timestamp fixtures read their stored micros) — DuckDB's
    * parquet reader sees at most µs, so the oracle compares the same
    * integers. Output: (l_event_id, r_event_id, user_id, gap_us), totally
    * ordered.
    */
  def withinWindowPairs(
      events: DataFrame,
      leftType: String,
      rightType: String,
      windowUs: Long = 60L * 60 * 1000 * 1000): DataFrame = {
    val tsUs = EventOps.tsMicros("ts", events.schema("ts").dataType)
    val l = events.filter(col("event_type") === leftType).select(
      col("user_id"),
      col("event_id").as("l_event_id"),
      tsUs.as("lt_us"))
    val r = events.filter(col("event_type") === rightType).select(
      col("user_id"),
      col("event_id").as("r_event_id"),
      tsUs.as("rt_us"))
    val lBucketed = l.withColumn(
      "bucket",
      explode(array(expr(s"lt_us div $windowUs"), expr(s"lt_us div $windowUs") + 1)))
    val rBucketed = r.withColumn("bucket", expr(s"rt_us div $windowUs"))
    lBucketed
      .join(rBucketed, Seq("user_id", "bucket"))
      .filter(col("rt_us") > col("lt_us") && col("rt_us") <= col("lt_us") + windowUs)
      .select(
        col("l_event_id"), col("r_event_id"), col("user_id"),
        (col("rt_us") - col("lt_us")).as("gap_us"))
      .orderBy(col("l_event_id"), col("r_event_id"))
  }
}
