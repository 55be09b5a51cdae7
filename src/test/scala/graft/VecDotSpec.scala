package graft

import org.apache.spark.sql.functions._

import graft.operators.SimOps

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot == the higher-order-function formulation, bit for bit, on the fixture") {
    val df = sf("embeddings").select(
      SimOps.dot(col("embedding"), col("embedding")).as("kernel"),
      SimOps.dotHof(col("embedding"), col("embedding")).as("hof"))
    val rows = df.as[(Double, Double)].collect()
    assert(rows.length == 500)
    rows.foreach { case (k, h) => assert(k == h) }
  }

  test("vec_dot on double arrays and mixed float/double") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4.0, 5.0, 6.0))).toDF("f", "d")
    val got = df.select(
      call_function("vec_dot", col("f"), col("d")),
      call_function("vec_dot", col("d"), col("d"))).as[(Double, Double)].head()
    assert(got == ((32.0, 77.0)))
  }

  test("vec_dot is usable from SQL (registered via GraftExtensions)") {
    Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b").createOrReplaceTempView("v")
    assert(spark.sql("SELECT vec_dot(a, b) FROM v").as[Double].head() == 0.0)
  }

  test("vec_dot: null array -> null; empty arrays -> 0.0; length mismatch stops short") {
    val df = Seq(
      (1, Some(Seq(1f, 2f)), Some(Seq(3f))),
      (2, None: Option[Seq[Float]], Some(Seq(1f))),
      (3, Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), call_function("vec_dot", col("a"), col("b")))
      .as[(Int, Option[Double])].collect().toMap
    assert(got(1) == Some(3.0))
    assert(got(2) == None)
    assert(got(3) == Some(0.0))
  }

  test("vec_dot stays inside whole-stage codegen; the HOF form does not") {
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    val kernelPlan = sf("embeddings")
      .select(SimOps.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(kernelPlan.linesIterator.next().trim.startsWith("*"), kernelPlan.take(300))
    val hofPlan = sf("embeddings")
      .select(SimOps.dotHof(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(!hofPlan.linesIterator.next().trim.startsWith("*"),
      s"expected the higher-order form to fall out of codegen:\n${hofPlan.take(300)}")
  }
}
