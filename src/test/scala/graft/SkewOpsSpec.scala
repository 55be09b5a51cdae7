package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewOpsSpec extends SparkSpec {

  test("saltedSumCount == direct groupBy on the fixture") {
    val li = sf("lineitem")
    val salted = SkewOps.saltedSumCount(
      li, keys = Seq("l_returnflag"),
      sums = Seq("qty" -> col("l_quantity")), salts = 8)
      .select(col("l_returnflag"), round(col("qty"), 2).as("qty"), col("n_rows"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    val direct = li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    assert(salted == direct)
  }

  test("saltedSumCount splits a hot key across reducers (phase-1 cardinality)") {
    import spark.implicits._
    // one massively hot key
    val hot = (1 to 10000).map(_ => ("hot", 1.0)) ++ Seq(("cold", 1.0))
    val df = hot.toDF("k", "v").repartition(8)
    val salt = pmod(monotonically_increasing_id(), lit(8L))
    val phase1Groups = df.groupBy(col("k"), salt.as("s")).count().count()
    assert(phase1Groups > 2, "salting must split the hot key into multiple partial groups")
    val result = SkewOps
      .saltedSumCount(df.repartition(8), Seq("k"), Seq("v" -> col("v")), salts = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(result("hot") == ((10000.0, 10000L)))
    assert(result("cold") == ((1.0, 1L)))
  }

  test("saltedJoin == plain join, including a hot key's full fan-out") {
    import spark.implicits._
    // fact side: one hot customer with 5000 orders, plus a long tail
    val fact = ((1 to 5000).map(i => (i.toLong, 7L)) ++
      (5001 to 5100).map(i => (i.toLong, (i % 50).toLong)))
      .toDF("order_id", "cust_id").repartition(8)
    val dim = (0 to 60).map(i => (i.toLong, s"cust_$i")).toDF("id", "name")
    val salted = SkewOps.saltedJoin(fact, dim, "cust_id", "id", salts = 8)
      .select("order_id", "cust_id", "name")
      .collect().map(_.toSeq).toSet
    val plain = fact.join(dim, col("cust_id") === col("id"))
      .select("order_id", "cust_id", "name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    // 5000 hot rows + the two tail orders (5007, 5057) with cust_id 7
    assert(salted.count(_(1) == 7L) == 5002)
  }

  test("distinct-count sketch: approx_count_distinct within 5% of exact") {
    val li = sf("lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
