package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark lacks natively (SURVEY
  * §2.2: joins of any kind are absent in the reference; this is the
  * time-series join every event/market-data pipeline needs).
  *
  * Semantics: for every left row, attach the LATEST right row of the same
  * key with `right.time <= left.time` (inclusive), or null if none.
  *
  * Algorithm — the one that survives 100 TB: tag and union both sides, one
  * hash shuffle on the key, one per-partition sort on (time, side, tie),
  * then a running `last(right_payload, ignoreNulls)` window. Cost is one
  * shuffle of rows-left + rows-right — compare a range-condition join,
  * which Spark plans as a broadcast nested loop (quadratic per key) —
  * and skew follows the key distribution exactly like any groupBy.
  *
  * Determinism: right rows sharing (key, time) resolve to the greatest
  * `tieBreak` value (they sort ascending and `last` wins), so results are
  * reproducible and oracle-comparable.
  */
object AsofOps {

  /** Returns the left rows (columns unchanged) plus `__asof`: a nullable
    * struct of the matched right row's columns.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      tieBreak: String): DataFrame = {
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    val lTagged = left.select(
      col(key).as("__k"), col(time).as("__t"), lit(1).as("__is_left"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val rTagged = right.select(
      col(key).as("__k"), col(time).as("__t"), lit(0).as("__is_left"),
      lit(null).cast(lStruct).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    // At equal time, right (0) sorts before left (1) => inclusive <=.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_left"), col("__r")(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(col("__l.*"), col("__asof"))
  }

  /** Declared-query shape: for each event of `leftType`, the same user's
    * most recent `rightType` event at or before it, with the gap in µs.
    * The join/order uses `ts` at full stored precision in whatever encoding
    * the file carries; the emitted gap goes through [[EventOps.tsMicros]]
    * (encoding-dispatching) and truncates EACH side to µs BEFORE the
    * subtract — on ns-long fixtures DuckDB's parquet reader truncates ns
    * timestamps to µs, so truncate-then-subtract matches
    * `epoch_us(l) - epoch_us(r)` where subtract-then-truncate would not
    * (on µs fixtures the two orders coincide).
    */
  def lastEventBefore(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val tsType = events.schema("ts").dataType
    val cols = Seq("event_id", "user_id", "ts").map(col)
    val l = events.filter(col("event_type") === leftType).select(cols: _*)
    val r = events.filter(col("event_type") === rightType).select(cols: _*)
    asofJoin(l, r, "user_id", "ts", "event_id")
      .select(
        col("event_id").as("l_event_id"),
        col("user_id"),
        col("__asof")("event_id").as("r_event_id"),
        (EventOps.tsMicros("ts", tsType) -
          EventOps.tsMicros("__asof.ts", tsType)).as("gap_us"))
      .orderBy(col("l_event_id"))
  }
}
