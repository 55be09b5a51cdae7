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

  test("cms: estimates never undercount, exact on a collision-free corpus") {
    val df = (Seq.fill(10)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma"))
      .toDF("token")
    val cms = SketchOps.cmsTable(df, col("token"))
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("token")
    val got = SketchOps.cmsEstimate(cms, probes)
      .as[(String, Long)].collect().toMap
    // 3 tokens in 4x256 counters: collisions impossible to matter here
    assert(got("alpha") == 10L && got("beta") == 3L && got("gamma") == 1L)
    assert(got("absent") == 0L)
  }

  test("cms: overestimate-only guarantee under heavy collision pressure") {
    // 2000 distinct tokens into 256-wide rows: collisions everywhere, yet
    // min-over-rows must never drop below the true count
    val df = (0 until 2000).flatMap(i => Seq.fill(i % 5 + 1)(s"t$i")).toDF("token")
    val cms = SketchOps.cmsTable(df, col("token"))
    val probes = (0 until 50).map(i => s"t${i * 40}").toDF("token")
    val est = SketchOps.cmsEstimate(cms, probes).as[(String, Long)].collect().toMap
    val exact = df.groupBy("token").count().as[(String, Long)].collect().toMap
    probes.as[String].collect().foreach { t =>
      assert(est(t) >= exact(t), s"$t: est ${est(t)} < exact ${exact(t)}")
    }
  }

  test("cms: tables merge by cell-wise addition") {
    val a = Seq("x", "x", "y").toDF("token")
    val b = Seq("x", "z").toDF("token")
    val merged = SketchOps.cmsTable(a, col("token"))
      .unionByName(SketchOps.cmsTable(b, col("token")))
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
    val whole = SketchOps.cmsTable(a.unionByName(b), col("token"))
    assert(merged.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet)
  }

  test("bloom: no false negatives, bounded false-positive residue") {
    val build = (0L until 100L).toDF("k")
    val probe = (0L until 1000L).toDF("k")
    val bits = SketchOps.bloomBits(build, col("k"))
    assert(bits.count() <= SketchOps.BloomBits)
    val hits = SketchOps.bloomHitKeys(probe, col("k"), bits)
      .as[Long].collect().toSet
    // every build key passes (Bloom's one-sided guarantee)...
    assert((0L until 100L).forall(hits.contains))
    // ...and the false-positive residue stays near the m=1024/k=3 design
    // point (~2% expected for 300 set bits; 10% is a loose determinism-
    // safe ceiling — the hash is fixed, so this never flakes)
    assert((hits.size - 100) < 90, s"false positives: ${hits.size - 100}")
  }

  test("bloomReduce: the per-row predicate form equals the hit-key join") {
    val build = (0L until 50L).map(_ * 3).toDF("k")
    val probe = (0L until 300L).toDF("k")
    val bits = SketchOps.bloomBits(build, col("k"))
    val viaReduce = SketchOps.bloomReduce(probe, col("k"), bits)
      .as[Long].collect().toSet
    val viaKeys = SketchOps.bloomHitKeys(probe, col("k"), bits)
      .as[Long].collect().toSet
    assert(viaReduce == viaKeys)
  }

  test("bloomReducePacked: codegen'd word probe equals the portable array form") {
    val build = (0L until 50L).map(_ * 3).toDF("k")
    // spark.range, not a LocalRelation: ConvertToLocalRelation would fold
    // the whole literal-bitset filter at optimization time and leave no
    // Filter node to assert on
    val probe = spark.range(300).toDF("k")
    val bits = SketchOps.bloomBits(build, col("k"))
    val packedDf = SketchOps.bloomReducePacked(probe, col("k"), bits)
    val viaPacked = packedDf.as[Long].collect().toSet
    val viaArray = SketchOps.bloomReduce(probe, col("k"), bits)
      .as[Long].collect().toSet
    assert(viaPacked == viaArray)
    // the packed probe must run inside a codegen stage (a '*'-marked
    // Filter), not fall back to interpreted eval
    val plan = packedDf.queryExecution.executedPlan.toString
    val filterLine = plan.linesIterator.find(_.contains("bitset_test")).get
    assert("""\*\(\d+\) Filter""".r.findFirstIn(filterLine).isDefined,
      s"not codegen'd: ${filterLine.take(120)}")
  }

  test("bitset_test: word boundaries, out-of-range, and SQL registration") {
    val df = spark.sql(
      "SELECT bitset_test(array(CAST(1 AS BIGINT), CAST(-9223372036854775808 AS BIGINT)), pos) AS hit " +
        "FROM VALUES (0L), (63L), (64L), (127L), (128L), (-1L) AS t(pos)")
    // bits set: 0 (word 0, lsb) and 127 (word 1, msb); 128 and -1 out of range
    assert(df.as[Boolean].collect().toSeq == Seq(true, false, false, true, false, false))
  }

  test("bitset_test: type mismatch is an analysis error, not a constructor throw") {
    // validation lives in checkInputDataTypes (the analyzer hook), so a bad
    // call surfaces as AnalysisException with the function's own message —
    // not an IllegalArgumentException from expression construction
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bitset_test(array('a', 'b'), 1L)").collect()
    }
    assert(e.getMessage.contains("bitset_test expects array<bigint>"),
      s"unexpected message: ${e.getMessage.take(200)}")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bitset_test(array(1L), 'x')").collect()
    }
    assert(e2.getMessage.contains("bitset_test expects an integral position"),
      s"unexpected message: ${e2.getMessage.take(200)}")
  }

  test("bloom: bit tables merge by union (bitwise OR in row form)") {
    val a = (0L until 40L).toDF("k")
    val b = (40L until 80L).toDF("k")
    val merged = SketchOps.bloomBits(a, col("k"))
      .unionByName(SketchOps.bloomBits(b, col("k"))).distinct()
    val whole = SketchOps.bloomBits(a.unionByName(b), col("k"))
    assert(merged.as[Long].collect().toSet == whole.as[Long].collect().toSet)
  }

  private def docsOf(srcTokens: (String, Seq[String])*) =
    srcTokens.zipWithIndex.map { case ((src, toks), i) =>
      (i.toLong, toks.mkString(" "), "en", src, toks.mkString(" ").length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("kmvSourceIntersect: unsaturated sketches are EXACT, not estimates") {
    // |union| = 40 < k = 64: the union sketch holds every hash, so
    // est_union/est_inter collapse to the exact counts
    val docs = docsOf(
      "x" -> (0 until 30).map(i => s"w$i"),
      "y" -> (10 until 40).map(i => s"w$i"))
    val r = SketchOps.kmvSourceIntersect(docs).head()
    assert(r.getAs[String]("src_a") == "x" && r.getAs[String]("src_b") == "y")
    assert(r.getAs[Long]("n_sk_union") == 40L)
    assert(r.getAs[Long]("j_num") == 20L)
    assert(r.getAs[Long]("est_union") == 40L)
    assert(r.getAs[Long]("est_inter") == 20L)
    assert(r.getAs[Long]("jaccard_bp") == 5000L)
    assert(r.getAs[Long]("exact_inter") == 20L)
  }

  test("kmvSourceIntersect: saturated estimates track truth across pairs") {
    // A∪B: 600 tokens, A∩B: 200 (J = 1/3); A∩C empty
    val docs = docsOf(
      "a" -> (0 until 400).map(i => s"t$i"),
      "b" -> (200 until 600).map(i => s"t$i"),
      "c" -> (0 until 100).map(i => s"z$i"))
    val rows = SketchOps.kmvSourceIntersect(docs).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r).toMap
    val ab = rows(("a", "b"))
    // k = 64 → ~12.5% std error; the md5 hash is fixed, so these bounds
    // are deterministic, just slack enough to document the error model
    val estU = ab.getAs[Long]("est_union")
    assert(estU > 300 && estU < 900, s"est_union $estU vs truth 600")
    val jbp = ab.getAs[Long]("jaccard_bp")
    assert(jbp > 1200 && jbp < 5600, s"jaccard_bp $jbp vs truth 3333")
    assert(ab.getAs[Long]("exact_inter") == 200L)
    // disjoint pair: j_num = 0 forces the intersection estimate to 0
    val ac = rows(("a", "c"))
    assert(ac.getAs[Long]("est_inter") == 0L && ac.getAs[Long]("exact_inter") == 0L)
    assert(ac.getAs[Long]("n_sk_union") == 64L)
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
