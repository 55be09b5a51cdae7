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
  * buckets). This probe measures all three claims: capped wall + candidate
  * counts at 1×/10×/100×, and the uncapped count at 1×/10× (100× uncapped
  * is the quadratic blowup the cap exists to prevent — projected, not run).
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

    def once(dir: String, cap: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = MultimodalOps.phashPairs(corpus(dir), maxBucket = cap).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def run(label: String, dir: String, cap: Int): Unit = {
      val (t1, n) = once(dir, cap)
      val (t2, _) = once(dir, cap)
      println(f"[phashscale] $label: ${math.min(t1, t2)}%.1f s (min of 2), pairs=$n")
    }

    once("/root/testdata/sf0.001", 64) // JIT/codegen warm-up
    run("sf0.1 capped(64)  ", sf01, 64)
    run("sf0.1 uncapped    ", sf01, 0)
    run("x10   capped(64)  ", x10, 64)
    run("x10   uncapped    ", x10, 0)
    run("x100  capped(64)  ", x100, 64)
    spark.stop()
  }
}
