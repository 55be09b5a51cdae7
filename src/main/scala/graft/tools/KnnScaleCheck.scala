package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.SimOps

/** Growth-law probe for [[SimOps.knnGraph]] — the r11 autopsy of the x100
  * rehearsal's 106.7x wall ratio on `q_knn_graph`, re-recorded in r12
  * THROUGH the declared entry after occupancy-preserving centroid sizing
  * became the default shape.
  *
  * Through round 11 the declared query pinned 16 IVF cells (centroids
  * vec_id 100..115); under ScaleGen x100 the corpus grows 100x over the
  * SAME 16 cells, so per-cell occupancy grows 100x and the in-cell pairing
  * volume O(Σ cell²) grows ~10,000x — the measured ~107x wall was the
  * engine absorbing a 10,000x pair blowup, not linear-work overhead.
  *
  * The scale discipline is corpus-derived nlist. Round 12 measured BOTH
  * candidate rules through the operator: constant occupancy (nlist = N/64,
  * [[SimOps.hashCentroidPred]]) kills the pair blowup but leaves
  * ASSIGNMENT quadratic — O(N·nlist) = O(N²/64) similarity evaluations —
  * even after [[SimOps.cellArgmax]] removed the window shuffle (28.6 s at
  * ×100); √N sizing ([[SimOps.sqrtCentroidPred]], the faiss nlist ∝ √N
  * guideline) balances assignment O(N·√N) against pairing O(N·√N) for
  * total O(N^1.5), and is the DECLARED shape since round 12. This probe
  * measures the declared √N rule at 1x and 100x, plus the constant-64
  * and fixed-16-cell rules at 100x as the two counterexamples.
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

    def once(
        dir: String,
        pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column,
        probes: Int = 1): Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val p = pred(emb)
      val t0 = System.nanoTime()
      SimOps.knnGraph(emb, centroidPred = p, probes = probes)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(
        label: String, dir: String,
        pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column,
        probes: Int = 1): Unit = {
      val t = math.min(once(dir, pred, probes), once(dir, pred, probes))
      println(f"[knnscale] $label: $t%.1f s (min of 2)")
    }
    val declared = (emb: org.apache.spark.sql.DataFrame) => SimOps.sqrtCentroidPred(emb)
    val const64 = (_: org.apache.spark.sql.DataFrame) => SimOps.hashCentroidPred()
    val fixed16 = (_: org.apache.spark.sql.DataFrame) => col("vec_id").between(100, 115)

    once("/root/testdata/sf0.001", declared) // JIT/codegen warm-up
    run("sf0.1 DECLARED sqrt-N nlist (faiss rule)", sf01, declared)
    run("x100  DECLARED sqrt-N nlist (faiss rule)", x100, declared)
    run("x100  n/64 cells (constant occupancy — assignment quadratic)", x100, const64)
    run("x100    16 cells (fixed nlist — occupancy x100)", x100, fixed16)
    // probes=4 through the cellArgTopP fold (r13): before the fold, this
    // setting rode cellRank's O(N·nlist) window shuffle
    run("x100  DECLARED sqrt-N nlist, probes=4 (cellArgTopP fold)", x100, declared, probes = 4)

    // r13: ASSIGNMENT-ONLY walls, flat fold vs two-level quantizer — the
    // cellArgmaxHier FLOP claim (~2·√nlist vs nlist sims per row) as a
    // measured row; pairing is excluded so the delta is pure assignment
    def assignOnce(
        dir: String, hier: Boolean,
        pred: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column = declared): Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = SimOps.normalized(emb, "vec_id", "embedding")
      val cents = n.filter(pred(emb))
        .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
      val t0 = System.nanoTime()
      (if (hier) SimOps.cellArgmaxHier(n, cents, "vec_id")
       else SimOps.cellArgmax(n, cents, "vec_id"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (hier <- Seq(false, true)) {
      val t = math.min(assignOnce(x100, hier), assignOnce(x100, hier))
      val label = if (hier) "two-level cellArgmaxHier" else "flat cellArgmax        "
      println(f"[knnscale] x100  assignment-only, $label: $t%.1f s (min of 2)")
    }
    // r14: the √nlist law AT A NLIST THAT MATTERS (≥ 10k): the constant-
    // occupancy rule on the x100 corpus gives nlist = N/64 ≈ 31k cells.
    // Flat assignment is O(N·nlist) sims; hier is O(N·~2√nlist) — FLOP
    // ratio ≈ √nlist/2 ≈ 88 asymptotically, bounded in practice by the
    // shuffle/scan overheads both paths share.
    for (hier <- Seq(false, true)) {
      val t = math.min(
        assignOnce(x100, hier, const64), assignOnce(x100, hier, const64))
      val label = if (hier) "two-level cellArgmaxHier" else "flat cellArgmax        "
      println(f"[knnscale] x100  assignment-only @ nlist=N/64 (~31k), $label: $t%.1f s (min of 2)")
    }
    spark.stop()
  }
}
