package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchOps

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: raw-estimator path within ~7% of exact on 5000 keys") {
    // 5000 distinct >> 2.5*m = 640, so the alpha*m^2/S path is exercised
    val df = (0 until 5000).map(i => ("g", i.toLong)).toDF("grp", "k")
    val est = SketchOps.hllDistinct(df, "grp", col("k"), "est")
      .as[(String, Long)].head()._2
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"estimate $est too far from 5000")
  }

  test("hllDistinct: linear-counting path within ~10% of exact on 150 keys") {
    val df = (0 until 150).map(i => ("g", i.toLong)).toDF("grp", "k")
    val est = SketchOps.hllDistinct(df, "grp", col("k"), "est")
      .as[(String, Long)].head()._2
    assert(math.abs(est - 150.0) / 150.0 < 0.15, s"estimate $est too far from 150")
  }

  test("hllDistinct: duplicate rows never move the estimate (multiset = set)") {
    val base = (0 until 300).map(i => ("g", i.toLong)).toDF("grp", "k")
    val dup = base.union(base).union(base.filter(col("k") < 50))
    val a = SketchOps.hllDistinct(base, "grp", col("k"), "est").as[(String, Long)].head()
    val b = SketchOps.hllDistinct(dup, "grp", col("k"), "est").as[(String, Long)].head()
    assert(a == b)
  }

  test("hllDistinct: estimate is partition-layout invariant") {
    val df = (0 until 1000).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "k")
    val a = SketchOps.hllDistinct(df, "grp", col("k"), "est")
      .as[(String, Long)].collect().toSeq
    val b = SketchOps.hllDistinct(df.repartition(17, col("k")), "grp", col("k"), "est")
      .as[(String, Long)].collect().toSeq
    assert(a == b)
    assert(a.length == 3)
  }

  test("hllDistinct: per-group estimates track per-group cardinalities") {
    // groups of very different cardinality in one pass
    val df = ((0 until 2000).map(i => ("big", i.toLong)) ++
      (0 until 20).map(i => ("small", i.toLong))).toDF("grp", "k")
    val got = SketchOps.hllDistinct(df, "grp", col("k"), "est")
      .as[(String, Long)].collect().toMap
    assert(math.abs(got("big") - 2000.0) / 2000.0 < 0.15)
    assert(math.abs(got("small") - 20.0) / 20.0 < 0.25)
  }
}
