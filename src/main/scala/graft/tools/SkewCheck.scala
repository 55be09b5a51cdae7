package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scale rehearsal for AQE's runtime skew-join split — the check the
  * PlanSpec pin cannot perform honestly: PlanSpec lowers the skew
  * thresholds to make an 8 KB partition count as "skewed", because at
  * sf0.1's volumes no partition can reach the PRODUCTION defaults
  * (`spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes` = 256m,
  * factor 5, advisory 64m). This tool runs on the [[ScaleGen]] 10×
  * directory (6 M lineitem rows), builds a hot-key shuffle join whose hot
  * partition genuinely exceeds the DEFAULT threshold, and records the
  * executed plan showing `skew=true` — no threshold tuning anywhere.
  *
  * The hot key is constructed (90% of fact rows collapse onto supplier 0,
  * padded to ~128 B/row so the one partition's compressed shuffle bytes
  * clear 256 MB) because the synthetic testdata is uniform by design; the
  * POINT is observing Spark's detector fire under production settings at a
  * volume the bench scale cannot reach. Broadcast is disabled only because
  * a skewed SMJ is the shape under test (at 100 TB the dim side of a
  * hot-key join is often too big to broadcast — exactly when AQE skew
  * handling matters).
  *
  * Usage: `runMain graft.tools.SkewCheck [scaleDir] [outFile]`.
  * Exit 0 + plan fragment written iff `skew=true` appears.
  */
object SkewCheck {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale10"
    val out = if (args.length > 1) args(1) else "SKEW_scale.txt"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // force the shuffle join shape; every skew threshold stays at DEFAULT
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        when(pmod(col("l_orderkey"), lit(10)) < 9, lit(0L))
          .otherwise(col("l_suppkey")).as("key"),
        // ~128 B of shuffle-incompressible pad per row so the hot
        // partition's COMPRESSED size clears the 256m default threshold
        concat(
          md5(col("l_orderkey").cast("string")),
          md5(col("l_partkey").cast("string")),
          md5(col("l_suppkey").cast("string")),
          md5(col("l_linenumber").cast("string"))).as("pad"))
    val dim = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("key"), col("s_name"))
      .unionByName(spark.range(1).select(lit(0L).as("key"), lit("hot").as("s_name")))

    val joined = fact.join(dim, "key").select(col("key"), col("pad"), col("s_name"))
    // consume the PAD through the join — a bare count() lets column pruning
    // strip the pad from the join exchange and the hot partition's bytes
    // legitimately stay under the threshold; summing pad lengths after the
    // join forces the shuffle to carry the full rows, and this aggregation
    // frame's own QueryExecution is the one executed (so its adaptive plan
    // is finalized when we read it)
    val probe = joined.agg(sum(length(col("pad"))).as("pad_bytes"))
    val t0 = System.nanoTime()
    // collect(), not head(): head wraps the query in a fresh CollectLimit
    // QueryExecution and THIS frame's adaptive plan would never finalize
    val padBytes = probe.collect()(0).getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val n = s"pad_bytes=$padBytes"
    val plan = probe.queryExecution.executedPlan.toString
    val skewLines = plan.linesIterator.filter(_.contains("skew=true")).toSeq
    val report =
      s"""AQE skew-join rehearsal @ $dir (${fact.count()} fact rows)
         |thresholds: ALL DEFAULT (factor=${spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")}, threshold=${spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")}, advisory=${spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")})
         |joined rows: $n in ${f"$sec%.1f"}s
         |skew=true lines in executed plan: ${skewLines.size}
         |${skewLines.mkString("\n")}
         |""".stripMargin
    val body = if (skewLines.nonEmpty) report else report + "\nFULL PLAN:\n" + plan
    java.nio.file.Files.write(java.nio.file.Paths.get(out), body.getBytes("UTF-8"))
    println(report)
    spark.stop()
    if (skewLines.isEmpty) {
      System.err.println("[skewcheck] FAILED: no skew=true in plan")
      sys.exit(1)
    }
  }
}
