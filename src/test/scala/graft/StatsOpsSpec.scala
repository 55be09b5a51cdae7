package graft

import graft.operators.StatsOps

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: equi-width buckets, max value clamped into the last") {
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val got = StatsOps.histogram(df, "v", 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // width 2: buckets [0,2) [2,4) [4,6) [6,8) [8,10], v=10 clamps to 4
    assert(got == Seq(
      (0L, 0L, 20000L, 2L),
      (1L, 20000L, 40000L, 2L),
      (2L, 40000L, 60000L, 2L),
      (3L, 60000L, 80000L, 2L),
      (4L, 80000L, 100000L, 3L)))
  }

  test("histogram counts cover every input row") {
    val df = sf("lineitem").select($"l_extendedprice")
    val n = StatsOps.histogram(df, "l_extendedprice", 8)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).as[Long].head()
    assert(n == df.count())
  }
}
