package graft

import org.apache.spark.sql.functions._

import graft.operators.SampleOps

class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample: deterministic, layout-invariant, roughly 1/k") {
    val df = sf("documents")
    val a = SampleOps.hashSample(df, col("doc_id"), 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = SampleOps.hashSample(df.repartition(13), col("doc_id"), 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    val total = df.count()
    assert(a.nonEmpty && math.abs(a.length - total / 10.0) / total < 0.1)
  }

  test("stratifiedSample: n rows per stratum, rn dense from 1") {
    val got = SampleOps.stratifiedSample(sf("documents"), "lang", "doc_id", n = 5)
      .as[(String, Int, Long)].collect().toSeq
    val byLang = got.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted == (1 to rows.length), s"$lang rn not dense")
      assert(rows.length <= 5)
    }
  }

  test("stratifiedSample: GroupTopK rewrite path equals the stock window path") {
    val viaRewrite = SampleOps.stratifiedSample(sf("documents"), "lang", "doc_id", 5)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.topk.rewrite.enabled", "false")
    try {
      val stock = SampleOps.stratifiedSample(sf("documents"), "lang", "doc_id", 5)
        .collect().map(_.toSeq).toSeq
      assert(viaRewrite == stock)
    } finally spark.conf.unset("spark.graft.topk.rewrite.enabled")
  }

  test("prioritySampleByGroup: per-group sample equals global prioritySample per group") {
    val docs = sf("documents")
    val got = SampleOps.prioritySampleByGroup(docs, "source", "n_chars", "doc_id", k = 3)
      .as[(String, Int, Long, Long)].collect().toSeq
    val bySource = got.groupBy(_._1)
    assert(bySource.size > 1)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._2).sorted == (1 to rows.length), s"$src rank not dense")
      val global = SampleOps.prioritySample(
          docs.filter(col("source") === src), "n_chars", "doc_id", k = 3)
        .as[(Int, Long, Long)].collect().toSeq
      assert(rows.map(r => (r._2, r._3, r._4)) == global, s"$src diverges")
    }
    // the window+filter shape must lower to the bounded GroupTopK node
    val plan = SampleOps.prioritySampleByGroup(docs, "source", "n_chars", "doc_id", 3)
      .queryExecution.optimizedPlan
    assert(plan.collect { case g: graft.plans.GroupTopK => g }.nonEmpty,
      s"GroupTopK rewrite did not fire:\n$plan")
  }

  test("mixWeights: hand-checked uniform-target multipliers") {
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c"))
      .zipWithIndex.map(_.swap).toDF("id", "grp")
    val got = SampleOps.mixWeights(df, "grp")
      .as[(String, Long, Long)].collect().toSeq
    // total 6 over 3 strata -> target 2 each: a x2.0, b x1.0, c x0.667
    assert(got == Seq(("a", 1L, 20000L), ("b", 2L, 10000L), ("c", 3L, 6667L)))
  }

  test("temperatureMix: sqrt targets sit between observed and uniform") {
    // strata 1/4/16: observed shares 476/1904/7619 bp; sqrt targets
    // 1/7, 2/7, 4/7 = 1429/2857/5714 bp; weights = target/observed
    val df = ((1 to 1) ++ (1 to 4).map(_ => 2) ++ (1 to 16).map(_ => 3))
      .zipWithIndex.map { case (g, i) => (i.toLong, s"s$g") }.toDF("id", "grp")
    val got = SampleOps.temperatureMix(df, "grp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("s1", 1L, 476L), ("s2", 4L, 1904L), ("s3", 16L, 7619L)))
    assert(got.map(_._4) == Seq(1429L, 2857L, 5714L))
    // head (s3) downsamples, tail (s1) upsamples, but less than uniform's
    // 7x: sqrt weight is 3x
    assert(got.map(_._5) == Seq(30000L, 15000L, 7500L))
  }

  test("stratifiedSample: re-running on the same data is bit-stable") {
    val df = (1L to 500L).map(i => (i, s"s${i % 4}")).toDF("id", "grp")
    val a = SampleOps.stratifiedSample(df, "grp", "id", 3).collect().map(_.toSeq).toSeq
    val b = SampleOps.stratifiedSample(df.repartition(7), "grp", "id", 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.length == 12) // 4 strata x 3
  }

  test("prioritySample: exact size, layout-stable, biased toward weight") {
    // weights 1 for most ids, 1000 for ids 1..40: the heavy block should
    // dominate a k=50 sample (E[u/w rank]: heavy items ~1000x priority)
    val df = (1L to 400L).map(i => (i, if (i <= 40) 1000L else 1L)).toDF("id", "w")
    val a = SampleOps.prioritySample(df, "w", "id", 50)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a.length == 50 && a.map(_._1) == (1 to 50))
    val b = SampleOps.prioritySample(df.repartition(9), "w", "id", 50)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    val heavyIn = a.count(_._2 <= 40)
    assert(heavyIn >= 35, s"only $heavyIn of 40 heavy items sampled")
  }

  test("prioritySample: fractional weights in (0,1) still bias the sample") {
    // pre-quantization a raw decimal(38,0) cast truncated these weights to
    // 0 — every priority 0, the "sample" silently degraded to id-hash
    // order; bp quantization keeps 0.4 vs 0.0002 a 2000x priority ratio
    val df = (1L to 400L)
      .map(i => (i, if (i <= 40) 0.4 else 0.0002)).toDF("id", "w")
    val got = SampleOps.prioritySample(df, "w", "id", 50)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.length == 50 && got.map(_._1) == (1 to 50))
    val heavyIn = got.count(_._2 <= 40)
    assert(heavyIn >= 35, s"only $heavyIn of 40 heavy fractional-weight rows sampled")
  }

  test("prioritySample: raising a weight can only pull a row IN") {
    val df = (1L to 200L).map(i => (i, 10L)).toDF("id", "w")
    val base = SampleOps.prioritySample(df, "w", "id", 20)
      .collect().map(_.getLong(1)).toSet
    // bump one sampled and one unsampled row 5x: the sampled one must stay
    val inId = base.head
    val boosted = df.withColumn("w",
      when(col("id") === inId, lit(50L)).otherwise(col("w")))
    val after = SampleOps.prioritySample(boosted, "w", "id", 20)
      .collect().map(_.getLong(1)).toSet
    assert(after.contains(inId))
  }

  test("realizeMixture: temperature quotas realized as contiguous hash-ranked slices") {
    // strata A: 9 docs, B: 4 docs -> s = 3, 2; s_sum = 5
    // target_bp = 6000 / 4000; total = 10 -> quota A = 6, B = 4
    val rows = (1L to 9L).map(i => (i, "A")) ++ (101L to 104L).map(i => (i, "B"))
    val df = rows.toDF("doc_id", "lang")
    val got = SampleOps.realizeMixture(df, "lang", "doc_id", total = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byLang = got.groupBy(_._1)
    assert(byLang("A").length == 6 && byLang("B").length == 4)
    // ranks contiguous from 1 within each stratum
    assert(byLang("A").map(_._2).sorted.toSeq == (1 to 6))
    assert(byLang("B").map(_._2).sorted.toSeq == (1 to 4))
    // deterministic and layout-invariant
    val again = SampleOps.realizeMixture(df.repartition(7), "lang", "doc_id", total = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
    // the winners are exactly the quota smallest id-hashes per stratum
    val hashes = df.select(col("doc_id"),
        graft.functions.StableHash.hash60(col("doc_id").cast("string")).as("h"))
      .as[(Long, Long)].collect().toMap
    val expectA = (1L to 9L).sortBy(id => (hashes(id), id)).take(6).toSet
    assert(byLang("A").map(_._3).toSet == expectA)
  }
}
