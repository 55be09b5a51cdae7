package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession
import graft.operators.{DedupOps, MultimodalOps, SimOps}

/** Growth readout THROUGH the declared cap-audit queries — the telemetry
  * proving its own worth: at each decade (1×/10×/100×) print every
  * family's (n_buckets, n_dropped, entries_dropped, pairs_kept,
  * pairs_forgone, hottest) row. The phash family's forgone share is the
  * number that silently went to 100% at ×100 under r11's raw-item
  * banding; a production run watching these rows sees the cliff coming
  * decades early instead of discovering it in recall.
  *
  * Usage: runMain graft.tools.CapAuditGrowth [sf01Dir] [x10Dir] [x100Dir]
  */
object CapAuditGrowth {

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x10 = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val x100 = if (args.length > 2) args(2) else "/tmp/graft_scale100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def embs(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
    val audits: Seq[(String, String => DataFrame)] = Seq(
      "minhash" -> ((d: String) => DedupOps.minhashCapAudit(DedupOps.plantedCorpus(docs(d)))),
      "jaccard" -> ((d: String) => DedupOps.jaccardCapAudit(DedupOps.plantedCorpus(docs(d)))),
      "substring" -> ((d: String) => DedupOps.substringCapAudit(DedupOps.plantedSpliceCorpus(docs(d)))),
      // r14: the declared q_cap_audit_phash shape — grid derived from the
      // probe-counted grid-8 hash universe (autoPhashGrid), so the forgone
      // share should flatten once the universe outgrows 8·2^8 and the rule
      // re-hashes at 16 (vs the fixed-8 row below)
      "phash-auto" -> ((d: String) => {
        val m = MultimodalOps.plantPhashCorpus(MultimodalOps.asMedia(docs(d)))
        val grid = MultimodalOps.autoPhashGrid(m)
        println(s"[capaudit] derived autoPhashGrid($d) = $grid")
        MultimodalOps.phashCapAudit(m, grid = grid)
      }),
      "phash-fixed8" -> ((d: String) => MultimodalOps.phashCapAudit(
        MultimodalOps.plantPhashCorpus(MultimodalOps.asMedia(docs(d))))),
      // r13: the declared q_cap_audit_neardup shape — autoSignBits derives
      // the key space from the distinct-rep count, so the forgone share
      // should stay roughly FLAT across decades (vs climbing at fixed bits)
      "neardup-auto" -> ((d: String) => {
        val planted = SimOps.plantedVectors(embs(d))
        val bits = SimOps.autoSignBits(planted)
        println(s"[capaudit] derived autoSignBits($d) = $bits")
        SimOps.nearDupCapAudit(planted, bits = bits)
      }),
      "neardup-fixed4" -> ((d: String) =>
        SimOps.nearDupCapAudit(SimOps.plantedVectors(embs(d)), bits = 4)))

    // optional 4th arg "recall" skips the [capaudit] section (re-measuring
    // only the recallaudit rows after a recall-side change)
    val recallOnly = args.lift(3).contains("recall")
    for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10, "x100" -> x100)
           if !recallOnly;
         (fam, f) <- audits) {
      val r = f(dir).head()
      val kind = r.getString(0)
      println(s"[capaudit] $label $fam($kind): buckets=${r.getLong(1)} dropped=${r.getLong(2)} " +
        s"entries_dropped=${r.getLong(3)} pairs_kept=${r.getLong(4)} " +
        s"pairs_forgone=${r.getLong(5)} hottest=${r.getLong(6)}")
    }
    // r13: the recall SIDE of the neardup audit pair — anchor-sample exact
    // truth vs the declared bucket pairing, at derived and fixed bits,
    // plus the OR-amplified 8-table remedy measured the same way
    import org.apache.spark.sql.functions._
    for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10, "x100" -> x100)) {
      val planted = SimOps.plantedVectors(embs(dir))
      val bits = SimOps.autoSignBits(planted)
      for ((fam, b) <- Seq(s"auto[bits=$bits]" -> bits, "fixed4" -> 4)) {
        val r = SimOps.nearDupRecallAudit(planted, bits = b).head()
        println(s"[recallaudit] $label neardup-$fam: anchors=${r.getLong(0)} " +
          s"truth=${r.getLong(1)} found=${r.getLong(2)} recall_bp=${r.getLong(3)}")
      }
      // multi-table: rep-level pairs (dedup-first on a rep-only corpus),
      // anchor rule identical to the audit's
      val reps = planted.groupBy(col("embedding"))
        .agg(min(col("vec_id")).as("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val nR = reps.count()
      val every = math.max(1L, math.ceil(nR / 64.0).toLong)
      val anch = reps.filter(
        graft.functions.StableHash.hash60(col("vec_id").cast("string")) % every === 0)
        .select(col("vec_id").as("a_id"))
      def multiFound(mbits: Int, mtables: Int): Long =
        SimOps.nearDupPairsMulti(reps, bits = mbits, tables = mtables)
          .join(broadcast(anch),
            col("id_a") === col("a_id") || col("id_b") === col("a_id"))
          .select(col("id_a"), col("id_b")).distinct().count()
      // fixed 8x4 (the declared small-corpus shape) and the scale-safe
      // derivation: bits from the corpus, tables = floor(dim / bits)
      // with dim read from the corpus (no literal 64)
      val dim = SimOps.embDim(planted)
      val dtables = math.max(1, dim / bits)
      // fixed 8x4 needs tables*bits = 32 <= dim (nearDupPairsMulti's
      // guard); skip with a note on narrow corpora instead of aborting
      // the remaining derived rows
      if (dim >= 32)
        println(s"[recallaudit] $label neardup-multi8x4: found=${multiFound(4, 8)} (same truth)")
      else
        println(s"[recallaudit] $label neardup-multi8x4: skipped (dim=$dim < 32)")
      println(s"[recallaudit] $label neardup-multi${dtables}x$bits: " +
        s"found=${multiFound(bits, dtables)} (same truth)")
      // r14: the cell-geometry handoff leg (q_embed_neardup_cells) scored
      // against the SAME anchor truth — nearest-centroid co-location at
      // occupancy-preserving nlist = reps/64. Three assignment variants:
      // flat (exact argmax, O(nlist) sims/row), hier sp=1 (the ~2·√nlist
      // scale path, with its supercell-boundary approximation), hier sp=2
      // (the declared recall knob on that approximation)
      def cellFound(hier: Boolean, sp: Int = 1, pr: Int = 1): Long =
        SimOps.cellNearDupPairs(reps,
          centroidPred = SimOps.hashCentroidPred(64), hier = hier,
          superProbes = sp, probes = pr)
          .join(broadcast(anch),
            col("id_a") === col("a_id") || col("id_b") === col("a_id"))
          .select(col("id_a"), col("id_b")).distinct().count()
      println(s"[recallaudit] $label neardup-cells-flat: " +
        s"found=${cellFound(false)} (same truth)")
      println(s"[recallaudit] $label neardup-cells-flat-p2: " +
        s"found=${cellFound(false, pr = 2)} (same truth)")
      println(s"[recallaudit] $label neardup-cells-hier: " +
        s"found=${cellFound(true)} (same truth)")
      println(s"[recallaudit] $label neardup-cells-hier-sp2: " +
        s"found=${cellFound(true, 2)} (same truth)")
      // r15: the probes lever ON the hier path (cellArgTopPHier) — the
      // boundary-recall knob now available past the flat broadcast limit;
      // the row to read: hier-p2 closing toward flat-p2 where hier-sp2
      // recovered only a sixth of it
      println(s"[recallaudit] $label neardup-cells-hier-p2: " +
        s"found=${cellFound(true, 1, 2)} (same truth)")
      println(s"[recallaudit] $label neardup-cells-hier-sp2-p2: " +
        s"found=${cellFound(true, 2, 2)} (same truth)")
      // the text leg: MinHash banding recall at Jaccard >= 0.8 (b=4, r=2:
      // collision prob >= 98% at the threshold — expect ~flat high recall)
      val mr = DedupOps.minhashRecallAudit(DedupOps.plantedCorpus(docs(dir))).head()
      println(s"[recallaudit] $label minhash-b4r2: anchors=${mr.getLong(0)} " +
        s"truth=${mr.getLong(1)} found=${mr.getLong(2)} recall_bp=${mr.getLong(3)}")
    }
    spark.stop()
  }
}
