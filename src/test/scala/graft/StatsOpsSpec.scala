package graft

import org.apache.spark.sql.functions.{col, sum}

import graft.operators.StatsOps

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: min/max/nulls/distinct per column in one pass") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 0.5), (2.0, null), (2.0, 0.5), (3.5, null))
      .toDF("a", "b")
    val got = StatsOps.profile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 10000L, 35000L, 0L, 3L),
      ("b", 5000L, 5000L, 2L, 1L)))
  }

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

  test("histogramQuantiles: sketch estimate within one bucket width of exact") {
    val df = sf("lineitem").select($"l_extendedprice")
    val nb = 64
    val got = StatsOps.histogramQuantiles(df, "l_extendedprice", nb, Seq(0.5, 0.95))
      .as[(Long, Long, Long)].collect()
    assert(got.length == 2)
    val span = df.agg(
      org.apache.spark.sql.functions.max($"l_extendedprice") -
        org.apache.spark.sql.functions.min($"l_extendedprice")).as[Double].head()
    val bucketBp = span / nb * 10000.0
    got.foreach { case (q, est, exact) =>
      assert(math.abs(est - exact) <= bucketBp,
        s"q=$q est=$est exact=$exact off by more than a bucket")
    }
  }

  test("histogramQuantiles: uniform data lands on the analytic quantile") {
    val df = (0 until 1000).map(_.toDouble).toDF("v")
    val got = StatsOps.histogramQuantiles(df, "v", 10, Seq(0.5))
      .as[(Long, Long, Long)].head()
    // r = 500 falls in bucket 5 ([499.5, 599.4]); interpolation gives
    // 499.5 + 99.9 * (500-500)/100 = 499.5 -> est 4995000; exact 499.5
    assert(got == ((5000L, 4995000L, 4995000L)))
  }

  test("histogramQuantiles: null values shift neither estimate nor exact rank") {
    // nulls must not form a bucket row: pre-fix they landed in a counter
    // bucket, inflating cumulative counts past bounds.n (computed non-null)
    // and pulling the exact percentile off its order statistic
    val clean = (0 until 1000).map(_.toDouble).toDF("v")
    val dirty = ((0 until 1000).map(i => java.lang.Double.valueOf(i.toDouble))
      ++ Seq.fill(257)(null: java.lang.Double)).toDF("v")
    val a = StatsOps.histogramQuantiles(clean, "v", 10, Seq(0.5, 0.9))
      .as[(Long, Long, Long)].collect().toSeq
    val b = StatsOps.histogramQuantiles(dirty, "v", 10, Seq(0.5, 0.9))
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b, s"null rows changed the quantiles: $a vs $b")
  }

  test("exactPercentiles: bit-identical to Spark's percentile() aggregate") {
    // mixed group sizes, duplicates, negatives, a 1-row group, an all-equal
    // group — every interpolation branch (integral position, equal
    // neighbors, true interpolation) and the lo==hi bucket guard
    val df = Seq(
      ("a", 3.5), ("a", -1.25), ("a", 3.5), ("a", 10.0), ("a", 0.5),
      ("b", 42.0),
      ("c", 7.0), ("c", 7.0), ("c", 7.0),
      ("d", 1.0), ("d", 2.0)).toDF("g", "v")
    val qs = Seq(0.0, 0.25, 0.5, 0.95, 1.0)
    val got = StatsOps.exactPercentiles(df, "v", Seq("g"), qs, nb = 4)
      .select($"g", $"qi", $"exact").as[(String, Int, Double)].collect()
      .map { case (g, qi, x) => (g, qi) -> x }.toMap
    val want = df.groupBy($"g")
      .agg(org.apache.spark.sql.functions.expr(
        s"percentile(v, array(${qs.mkString("D,")}D))").as("p"))
      .select($"g", $"p").as[(String, Seq[Double])].collect()
      .flatMap { case (g, ps) => ps.zipWithIndex.map { case (x, i) => (g, i) -> x } }
      .toMap
    assert(got.keySet == want.keySet)
    // java.lang.Double.compare catches a sign/NaN mismatch too; exact
    // equality is the contract (same arithmetic, not "close")
    want.foreach { case (k, x) =>
      assert(java.lang.Double.compare(got(k), x) == 0, s"$k: got ${got(k)} want $x")
    }
  }

  test("exactPercentiles: global (no group) matches percentile()") {
    val df = (1 to 101).map(i => (i * i).toDouble).toDF("v")
    val got = StatsOps.exactPercentiles(df, "v", Seq.empty, Seq(0.5, 0.9))
      .select($"qi", $"exact").as[(Int, Double)].collect().toMap
    val want = df.agg(org.apache.spark.sql.functions.expr(
      "percentile(v, array(0.5D, 0.9D))").as("p")).as[Seq[Double]].head()
    assert(got(0) == want(0) && got(1) == want(1), s"$got vs $want")
  }

  test("basketRules: hand-checked support/confidence/lift; both directions ranked") {
    // baskets: {10,20} x2, {10,20,30}, {30} -> pair (10,20) support 3,
    // others support 1 (dropped at minSupport 2)
    val li = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L),
      (4L, 30L), (4L, 30L)) // duplicate line of the same part collapses
      .toDF("l_orderkey", "l_partkey")
    val got = StatsOps.basketRules(li, minSupport = 2L, k = 10)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    // conf(10->20) = 3/3 = 10000 bp; lift = 3*4/(3*3) = 13333 bp, both ways
    assert(got == Seq(
      (1, 10L, 20L, 3L, 10000L, 13333L),
      (2, 20L, 10L, 3L, 10000L, 13333L)))
  }

  test("corrByGroup: hand-checked perfect, inverse, and degenerate groups") {
    val df = Seq(
      // y = 2x → corr exactly +1
      ("up", 1.0, 2.0), ("up", 2.0, 4.0), ("up", 3.0, 6.0),
      // y = -x + 4 → corr exactly -1
      ("dn", 1.0, 3.0), ("dn", 2.0, 2.0), ("dn", 3.0, 1.0),
      // zero variance in x → NULL
      ("flat", 5.0, 1.0), ("flat", 5.0, 9.0))
      .toDF("g", "x", "y")
    val got = StatsOps.corrByGroup(df, "g", col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == Seq(
      ("dn", 3L, 20000L, 20000L, Some(-10000L)),
      ("flat", 2L, 50000L, 50000L, None),
      ("up", 3L, 20000L, 40000L, Some(10000L))))
  }

  test("corrStats: sufficient statistics merge across any split of the data") {
    val rows = (1 to 40).map(i => ("g", i * 0.37, (i % 7) * 1.5 + i * 0.11))
    val full = StatsOps.corrStats(rows.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .collect().map(_.toSeq).toSeq
    // stats of parts, re-summed, equal stats of the whole — the mergeable
    // closure exact corr() floats lack
    val parts = Seq(rows.take(13), rows.slice(13, 29), rows.drop(29))
      .map(p => StatsOps.corrStats(p.toDF("g", "x", "y"), "g", col("x"), col("y")))
    val merged = parts.reduce(_ unionByName _)
      .groupBy(col("g"))
      .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxy").as("sxy"), sum("sx2").as("sx2"), sum("sy2").as("sy2"))
      .select(col("g"), col("n"), col("sx").cast("decimal(38,0)"),
        col("sy").cast("decimal(38,0)"), col("sxy").cast("decimal(38,0)"),
        col("sx2").cast("decimal(38,0)"), col("sy2").cast("decimal(38,0)"))
      .collect().map(_.toSeq).toSeq
    assert(merged == full)
  }

  test("linregFit: exact-fit data recovers the generating weights exactly") {
    // y = 7 + 3*x1 + 5*x2 with no noise: the least-squares solution IS the
    // generating triple, so each Cramer rational must reduce to it exactly
    val rows = for (a <- 1 to 6; b <- 0 to 4)
      yield (a.toLong, (b + a % 3).toLong)
    val df = rows.map { case (x1, x2) => (x1, x2, 7L + 3 * x1 + 5 * x2) }
      .toDF("x1", "x2", "y")
    val got = StatsOps.linregFit(df, col("x1"), col("x2"), col("y"))
      .as[(String, String, String)].collect().toSeq
    val den = BigInt(got.head._3)
    assert(den != 0)
    val ws = got.map { case (c, num, d) =>
      assert(BigInt(d) == den); c -> BigInt(num) }.toMap
    assert(ws("intercept") == BigInt(7) * den)
    assert(ws("x1") == BigInt(3) * den)
    assert(ws("x2") == BigInt(5) * den)
  }

  test("linregFit: collinear features emit den = 0, never a wrong weight") {
    val df = (1 to 10).map(i => (i.toLong, 2L * i, 5L + i)).toDF("x1", "x2", "y")
    val got = StatsOps.linregFit(df, col("x1"), col("x2"), col("y"))
      .as[(String, String, String)].collect().toSeq
    assert(got.map(_._3).forall(_ == "0"))
  }

  test("welchTTest: replayed t/df on a hand fixture; degenerate side goes NULL") {
    def ev(rows: (String, Double)*) = rows.zipWithIndex
      .map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val df = ev(("view", 1.0), ("view", 2.0), ("view", 3.0),
      ("purchase", 5.0), ("purchase", 7.0))
    val r = StatsOps.welchTTest(df).head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert((r.getLong(2), r.getLong(3)) == ((20000L, 60000L)))
    // replay the shared finalize in plain doubles from the exact bp stats
    val (na, sa, s2a) = (3.0, 60000.0, 1400000000.0)   // 1,2,3 in bp
    val (nb, sb, s2b) = (2.0, 120000.0, 7400000000.0)  // 5,7 in bp
    val dm = (sa * nb - sb * na) / (na * nb)
    val wa = (na * s2a - sa * sa) / (na * (na - 1.0)) / na
    val wb = (nb * s2b - sb * sb) / (nb * (nb - 1.0)) / nb
    assert(r.getLong(4) == math.floor(10000.0 * (dm / math.sqrt(wa + wb)) + 0.5).toLong)
    assert(r.getLong(5) == math.floor(10000.0 * ((wa + wb) * (wa + wb) /
      (wa * wa / (na - 1.0) + wb * wb / (nb - 1.0))) + 0.5).toLong)
    // one-row side: no variance estimate exists -> NULL, never a number
    val degenerate = StatsOps.welchTTest(ev(("view", 1.0), ("purchase", 2.0))).head()
    assert(degenerate.isNullAt(4) && degenerate.isNullAt(5))
  }

  test("welchTTest: negative bp sums FLOOR toward -inf (DuckDB // rule, not div)") {
    def ev(rows: (String, Double)*) = rows.zipWithIndex
      .map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val r = StatsOps.welchTTest(ev(
      ("view", -1.0), ("view", -2.0), ("view", -2.0),
      ("purchase", 1.0), ("purchase", 2.0))).head()
    // s_a = -50000 bp over n_a = 3: floor(-16666.67) = -16667; Spark's
    // `div` would truncate to -16666 and diverge from the DuckDB mirror
    assert(r.getLong(2) == -16667L)
    assert(r.getLong(3) == 15000L)
  }

  test("mannWhitney: NULL values enter neither the ranks nor n_a/n_b") {
    val df = Seq(
      (1L, "view", Some(1.0)), (2L, "view", None), (3L, "view", Some(2.0)),
      (4L, "purchase", Some(2.0)), (5L, "purchase", None), (6L, "purchase", Some(3.0)))
      .toDF("event_id", "event_type", "value")
    val r = StatsOps.mannWhitney(df).head()
    // NULL rows dropped: a = {1,2}, b = {2,3}; a beats b never, one tie
    // (2,2) -> U_a = 1/2 -> U2_a = 1; halves still sum to 2*na*nb
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getLong(2) == 1L && r.getLong(3) == 2L * 2L * 2L - 1L)
  }

  test("mannWhitney: midrank-exact U on a tied fixture; U2 halves sum to 2*na*nb") {
    def ev(rows: (String, Double)*) = rows.zipWithIndex
      .map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    // values: a = {1, 2, 2}, b = {2, 3}; pairs where a beats b: 0,
    // ties a=2 vs b=2: 2 pairs -> U_a = 0 + 2*(1/2) = 1 -> U2_a = 2
    val r = StatsOps.mannWhitney(ev(
      ("view", 1.0), ("view", 2.0), ("view", 2.0),
      ("purchase", 2.0), ("purchase", 3.0))).head()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert(r.getLong(2) == 2L)                    // u2_a
    assert(r.getLong(3) == 2L * 3L * 2L - 2L)     // u2_b; halves sum to 2*na*nb
    // AUC_a = U_a/(na*nb) = 1/6 -> 1666 bp
    assert(r.getLong(4) == 1666L)
    // stochastic dominance flips the AUC toward 10000
    val dom = StatsOps.mannWhitney(ev(
      ("view", 9.0), ("view", 8.0), ("purchase", 1.0), ("purchase", 2.0))).head()
    assert(dom.getLong(4) == 10000L)
  }
}
