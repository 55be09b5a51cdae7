package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.SimOps

/** Growth-law probe for [[SimOps.knnGraph]] — the r11 autopsy of the x100
  * rehearsal's 106.7x wall ratio on `q_knn_graph`.
  *
  * The declared query pins 16 IVF cells (centroids vec_id 100..115) so the
  * oracle stays comparable; under ScaleGen x100 the corpus grows 100x over
  * the SAME 16 cells, so per-cell occupancy grows 100x and the in-cell
  * pairing volume O(Σ cell²) grows ~10,000x — the measured ~107x wall is
  * the engine absorbing a 10,000x pair blowup, not linear-work overhead.
  * The IVF discipline at scale is OCCUPANCY-PRESERVING nlist (cells ∝ N,
  * constant vectors/cell — exactly how production IVF sizes nlist): this
  * probe re-measures x100 with 1600 cells (100x the cells, same ~125
  * vectors/cell as sf0.1) and prints both, min-of-2 after a warm-up.
  *
  * Usage: runMain graft.tools.KnnScaleCheck [scale100Dir] [sf01Dir]
  */
object KnnScaleCheck {

  def main(args: Array[String]): Unit = {
    val x100 = args.headOption.getOrElse("/tmp/graft_scale100")
    val sf01 = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(dir: String, lo: Long, hi: Long): Double = {
      val t0 = System.nanoTime()
      SimOps.knnGraph(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        centroidPred = col("vec_id").between(lo, hi))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(label: String, dir: String, lo: Long, hi: Long): Unit = {
      val t = math.min(once(dir, lo, hi), once(dir, lo, hi))
      println(f"[knnscale] $label: $t%.1f s (min of 2)")
    }

    once("/root/testdata/sf0.001", 100, 115) // JIT/codegen warm-up
    run("sf0.1   16 cells (declared shape)", sf01, 100, 115)
    run("x100    16 cells (fixed nlist — occupancy x100)", x100, 100, 115)
    run("x100  1600 cells (occupancy-preserving nlist)", x100, 100, 1699)
    spark.stop()
  }
}
