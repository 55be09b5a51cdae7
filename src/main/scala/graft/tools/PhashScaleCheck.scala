package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.MultimodalOps

/** Growth-law probe for [[MultimodalOps.phashPairs]] — the media analog of
  * `graft.tools.JaccardGrowth`'s two-regime measurement.
  *
  * The 8×8 aHash band-key space is FIXED at grid·2^grid = 2,048 buckets, so
  * unlike MinHash bands (whose key space grows with content diversity),
  * corpus growth lengthens every bucket: mean occupancy ∝ N and uncapped
  * pairing ∝ N² — structurally the same as `jaccardPairs`' boilerplate
  * regime, but here it is the DEFAULT regime, not a pathology. The
  * `maxBucket` cap therefore bounds pairing at ≤ grid·2^grid·cap²/2
  * candidates TOTAL (a constant in N), trading recall on overflowed
  * buckets; the production scale knob is `grid` itself (grid=16 → 1.05 M
  * buckets). This probe measures all three claims: capped wall + emitted
  * pair counts at 1×/10×/100×, the uncapped WALL at 1× only, and the
  * uncapped candidate volume at every scale ANALYTICALLY from the bucket
  * histogram (Σ n·(n−1)/2) — materializing it is the quadratic blowup the
  * cap exists to prevent (the first cut of this probe ran x10 uncapped
  * for real and OOM'd a 32-thread JVM on the in-bucket pair expansion,
  * which is the measurement, just not a number).
  *
  * Usage: runMain graft.tools.PhashScaleCheck [sf01Dir] [x10Dir] [x100Dir]
  */
object PhashScaleCheck {

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x10 = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val x100 = if (args.length > 2) args(2) else "/tmp/graft_scale100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(dir: String) =
      MultimodalOps.plantPhashCorpus(MultimodalOps.asMedia(
        spark.read.parquet(s"$dir/documents.parquet")))

    def once(dir: String, cap: Int, grid: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = MultimodalOps.phashPairs(corpus(dir), grid = grid, maxBucket = cap).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def run(label: String, dir: String, cap: Int, grid: Int = 8): Unit = {
      val (t1, n) = once(dir, cap, grid)
      val (t2, _) = once(dir, cap, grid)
      println(f"[phashscale] $label: ${math.min(t1, t2)}%.1f s (min of 2), pairs=$n")
    }
    // uncapped candidate volume from the bucket histogram — never expanded
    def candidates(label: String, dir: String, grid: Int = 8): Unit = {
      import spark.implicits._
      val media = corpus(dir)
      val sk = MultimodalOps.phashBands(media.as[graft.operators.MediaRow], grid).toDF()
      val row = sk
        .select(col("media_id"), posexplode(col("bands")))
        .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2")).as("cand"),
          sum(expr("CASE WHEN n > 64 THEN 0 ELSE n * (n - 1) div 2 END")).as("cand_capped"),
          max(col("n")).as("hottest"))
        .head()
      println(s"[phashscale] $label: uncapped candidates=${row.getLong(0)}, " +
        s"within-cap candidates=${row.getLong(1)}, hottest bucket=${row.getLong(2)}")
    }

    // exact-dedup-first discipline: collapse identical hashes to one
    // representative (the production order — cheap md5 groups strike exact
    // copies BEFORE the LSH ever sees them), then band the representatives
    def candidatesRep(label: String, dir: String, grid: Int = 8): Unit = {
      import spark.implicits._
      val sk = MultimodalOps.phashBands(
        corpus(dir).as[graft.operators.MediaRow], grid).toDF()
      val reps = sk.groupBy(col("bands")).agg(min(col("media_id")).as("media_id"))
      val row = reps
        .select(col("media_id"), posexplode(col("bands")))
        .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2")).as("cand"),
          sum(expr("CASE WHEN n > 64 THEN 0 ELSE n * (n - 1) div 2 END")).as("cand_capped"),
          max(col("n")).as("hottest"), sum(col("n")).as("entries"))
        .head()
      println(s"[phashscale] $label: reps=${row.getLong(3) / grid}, " +
        s"uncapped candidates=${row.getLong(0)}, " +
        s"within-cap candidates=${row.getLong(1)}, hottest bucket=${row.getLong(2)}")
    }

    once("/root/testdata/sf0.001", 64, 8) // JIT/codegen warm-up
    run("sf0.1 capped(64) grid=8 ", sf01, 64)
    run("sf0.1 uncapped   grid=8 ", sf01, 0)
    run("x10   capped(64) grid=8 ", x10, 64)
    run("x100  capped(64) grid=8 ", x100, 64)
    // occupancy-preserving discipline: 16x16 grid -> 16 bands x 2^16 values
    // = 1.05M buckets, the Manku-style multi-index sizing
    run("x100  capped(64) grid=16", x100, 64, grid = 16)
    candidates("sf0.1 grid=8 ", sf01)
    candidates("x10   grid=8 ", x10)
    candidates("x100  grid=8 ", x100)
    candidates("x100  grid=16", x100, grid = 16)
    candidatesRep("x100  rep grid=8 ", x100)
    candidatesRep("x100  rep grid=16", x100, grid = 16)
    spark.stop()
  }
}
