package graft

import org.apache.spark.sql.functions._

import graft.operators.LayoutOps

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("interleave16: hand-checked Morton bit placement") {
    val df = Seq((3L, 1L), (65535L, 0L), (0L, 65535L)).toDF("xb", "yb")
    val got = df.select(LayoutOps.interleave16(col("xb"), col("yb")).as("z"))
      .as[Long].collect().toSeq
    // x=0b11,y=0b01 -> bits 0,1,2 set = 7; x full -> even bits = 0x55555555
    assert(got == Seq(7L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("zorderStats: bucket envelopes are tight on BOTH dimensions") {
    val li = sf("lineitem")
    val stats = LayoutOps.zorderStats(li, "l_partkey", "l_suppkey", 64)
      .select("n_rows", "min_x", "max_x", "min_y", "max_y")
      .as[(Long, Long, Long, Long, Long)].collect()
    val Seq(xSpan, ySpan) = Seq(
      li.agg(max("l_partkey") - min("l_partkey")),
      li.agg(max("l_suppkey") - min("l_suppkey"))).map(_.as[Long].head())
    def wavg(ext: ((Long, Long, Long, Long, Long)) => Long): Double = {
      val n = stats.map(_._1).sum.toDouble
      stats.map(s => s._1 * ext(s).toDouble).sum / n
    }
    // a 64-bucket z-curve is an 8x8 grid: each bucket should pin ~1/8 of
    // each dimension; 0.4 of the span is a loose deterministic bound —
    // a single-column sort would leave one dimension at ~1.0
    assert(wavg(s => s._3 - s._2) < 0.4 * xSpan, "x envelopes too wide")
    assert(wavg(s => s._5 - s._4) < 0.4 * ySpan, "y envelopes too wide")
  }

  test("compactionPlan: ceil-divided file counts, 1-file floor for empties") {
    import spark.implicits._
    val df = Seq(
      ("a", 4L), ("a", 4L), ("a", 2L), // 10 bytes -> 3 files of target 4
      ("b", 2L), ("b", 2L),            // 4 bytes  -> exactly 1 file
      ("c", 0L))                       // 0 bytes  -> still 1 file
      .toDF("source", "n_chars")
    val got = LayoutOps.compactionPlan(df, "source", "n_chars", targetBytes = 4L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 10L, 3L, 1L),
      ("b", 2L, 4L, 1L, 2L),
      ("c", 1L, 0L, 1L, 1L)))
  }

  test("zorderRepartition: every partition owns a rectangle of (x, y) space") {
    val li = sf("lineitem").select("l_partkey", "l_suppkey")
    val parts = LayoutOps.zorderRepartition(li, "l_partkey", "l_suppkey", 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(
        (max("l_partkey") - min("l_partkey")).as("xext"),
        (max("l_suppkey") - min("l_suppkey")).as("yext"),
        count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect()
    val xSpan = li.agg(max("l_partkey") - min("l_partkey")).as[Long].head().toDouble
    val ySpan = li.agg(max("l_suppkey") - min("l_suppkey")).as[Long].head().toDouble
    val n = parts.map(_._4).sum.toDouble
    val xAvg = parts.map(p => p._4 * p._2 / xSpan).sum / n
    val yAvg = parts.map(p => p._4 * p._3 / ySpan).sum / n
    // row-weighted mean extents well under the full span on both axes:
    // that's what makes per-file parquet stats prune either predicate
    assert(xAvg < 0.6 && yAvg < 0.6, f"extents x=$xAvg%.2f y=$yAvg%.2f")
  }
}
