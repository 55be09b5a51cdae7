package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketing — the 100 TB technique for repeated joins
  * on the same key: both tables pre-bucketed on the join key join with ZERO
  * shuffle exchanges (each task reads matching bucket files from both
  * sides). At scale this converts every recurring fact-to-fact join from a
  * full 2-table shuffle into a local merge.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key plans no shuffle exchange") {
    val li = sf("lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    val ord = sf("orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge path so the assertion is about bucketing, not
      // about the small fixture fitting a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.sparkPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(600)}")
      // and it computes the same thing as the plain join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("aggregation on the bucket key also avoids the shuffle") {
    val li = sf("lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS li_bucketed2")
    li.write.bucketBy(8, "l_orderkey").mode("overwrite").saveAsTable("li_bucketed2")
    try {
      val agg = spark.table("li_bucketed2")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.sparkPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n${plan.take(600)}")
      assert(agg.count() == li.select("l_orderkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS li_bucketed2")
  }
}
