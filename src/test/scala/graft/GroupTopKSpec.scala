package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The GroupTopK rewrite (Rule + Strategy + SparkPlan): the row_number<=k
  * window pattern must plan as the bounded partial/final operator pair and
  * return byte-identical results to the stock WindowExec path.
  */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private val gate = "spark.graft.topk.rewrite.enabled"

  private def topkQuery(): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    sf("lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  private def withGate[A](enabled: Boolean)(f: => A): A = {
    spark.conf.set(gate, enabled.toString)
    try f finally spark.conf.unset(gate)
  }

  test("rule fires: plan contains GroupTopKFinal/Partial and no Window") {
    withGate(enabled = true) {
      val p = topkQuery().queryExecution.executedPlan.toString
      assert(p.contains("GroupTopKFinal"), p.take(600))
      assert(p.contains("GroupTopKPartial"), p.take(600))
      assert(!p.contains("Window"), s"WindowExec should be gone:\n${p.take(600)}")
    }
  }

  test("gate off: stock window plan, no GroupTopK") {
    withGate(enabled = false) {
      val p = topkQuery().queryExecution.executedPlan.toString
      assert(!p.contains("GroupTopK"), p.take(600))
      assert(p.contains("Window"), p.take(600))
    }
  }

  test("rewritten result is identical to the stock window result") {
    val rewritten = withGate(enabled = true)(topkQuery().collect().toSeq)
    val stock = withGate(enabled = false)(topkQuery().collect().toSeq)
    assert(rewritten == stock)
    assert(rewritten.nonEmpty)
  }

  test("rn < k and rn = 1 forms rewrite; non-rank filters don't") {
    withGate(enabled = true) {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val base = sf("lineitem").withColumn("rn", row_number().over(w))
      assert(base.filter(col("rn") < 4).queryExecution.executedPlan.toString
        .contains("GroupTopKFinal"))
      assert(base.filter(col("rn") === 1).queryExecution.executedPlan.toString
        .contains("GroupTopKFinal"))
      // a filter on a non-rank column must keep the stock window
      assert(!base.filter(col("l_quantity") > 10).queryExecution.executedPlan.toString
        .contains("GroupTopK"))
    }
  }

  test("rank/dense_rank windows are left alone (different tie semantics)") {
    withGate(enabled = true) {
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice").desc)
      val p = sf("lineitem")
        .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
        .queryExecution.executedPlan.toString
      assert(!p.contains("GroupTopK"), p.take(400))
    }
  }

  test("per-group semantics on a hand-built frame: correct rows, ranks, ties") {
    withGate(enabled = true) {
      val df = Seq(
        ("a", 10, 1), ("a", 30, 2), ("a", 20, 3), ("a", 30, 4),
        ("b", 5, 5),
        ("c", 1, 6), ("c", 2, 7), ("c", 3, 8), ("c", 4, 9))
        .toDF("g", "score", "id")
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
      val got = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .select(col("g"), col("rn"), col("score"), col("id"))
        .orderBy(col("g"), col("rn"))
        .as[(String, Int, Int, Int)].collect().toSeq
      assert(got.exists(_ => true))
      assert(got == Seq(
        ("a", 1, 30, 2), ("a", 2, 30, 4),
        ("b", 1, 5, 5),
        ("c", 1, 4, 9), ("c", 2, 3, 8)))
      // and the plan really was the custom operator
      val p = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .queryExecution.executedPlan.toString
      assert(p.contains("GroupTopKFinal"), p.take(400))
    }
  }
}
