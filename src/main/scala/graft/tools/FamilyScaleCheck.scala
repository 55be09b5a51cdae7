package graft.tools

import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions.{col, count, max, sum}

import graft.GraftSession
import graft.operators.{DedupOps, MultimodalOps, SimOps, TextOps}

/** Measured-decade (1×/10×/100×) rehearsal for the heaviest round-11
  * families — exact-substring spans, the strike edit pass, and CDC storage
  * dedup — the same protocol as [[JaccardGrowth]]/[[PhashScaleCheck]]:
  * min-of-2 walls through the DECLARED operator compositions over the
  * ScaleGen-replicated dirs.
  *
  * Expected laws (each operator's scaladoc makes the bounded-state
  * argument; this probe turns the two heaviest into numbers):
  *
  *  - `exactSubstringSpans` / `substringStrike`: ScaleGen's suffixed
  *    replication is the KEYED regime — every replica's grams are distinct
  *    keys, so postings multiply but never lengthen and the occurrence cap
  *    stays idle; pairing volume should scale ~linearly like
  *    `jaccardPairs`' keyed regime.
  *  - `cdcDuplicateChunks`: chunk hashes are uniform keys; the one hash
  *    aggregation is map-side combined — linear by construction.
  *
  * Usage: runMain graft.tools.FamilyScaleCheck [sf01Dir] [x10Dir] [x100Dir]
  */
object FamilyScaleCheck {

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

    val ops: Seq[(String, String => DataFrame)] = Seq(
      "q_dedup_substring" ->
        ((dir: String) => DedupOps.exactSubstringSpans(DedupOps.plantedSpliceCorpus(docs(dir)))),
      "q_dedup_strike" ->
        ((dir: String) => DedupOps.substringStrike(DedupOps.plantedSpliceCorpus(docs(dir)))),
      "q_media_cdc" ->
        ((dir: String) => MultimodalOps.cdcDuplicateChunks(
          MultimodalOps.asMedia(DedupOps.plantedCorpus(docs(dir))))),
      // r13: the two remaining scaladoc-only bounded-state families. The
      // law to observe: unigramLm's EM state is the distinct-WORD table
      // (ScaleGen suffixing multiplies the word universe ~linearly; the
      // vocab-sized driver collect is the segmentation cost table, bounded
      // by vocab not corpus), and packCurriculum is two prefix-sum passes
      // whose only non-linear step is the source-sized window — walls
      // should track corpus ~linearly with caps/collects flat.
      "q_unigram_lm" ->
        ((dir: String) => TextOps.unigramLm(docs(dir))),
      "q_pack_curriculum" ->
        ((dir: String) => TextOps.packCurriculum(docs(dir), budget = 512)),
      // r14: the round's new declared shapes. keep_best rides the full
      // pairs→clusters→selection chain (CC state is the pair graph —
      // density growth multiplies cluster sizes, extent growth cluster
      // count; the means aggregate is |clusters|·d either way), and the
      // cells flat-vs-p2 pair prices the probes knob's "exactly 2× pair
      // volume, zero extra assignment" claim as walls
      "q_embed_keep_best" ->
        ((dir: String) => {
          val planted = SimOps.plantedVectors(embs(dir))
          SimOps.clusterKeepBest(planted,
            DedupOps.dedupClusters(
              SimOps.nearDupPairs(planted, bits = SimOps.autoSignBits(planted))
                .select(col("id_a"), col("id_b")))
              .withColumnRenamed("doc_id", "vec_id"))
        }),
      "q_embed_cells_flat" ->
        ((dir: String) => SimOps.cellNearDupPairs(
          SimOps.plantedVectors(embs(dir)),
          centroidPred = SimOps.hashCentroidPred(64))),
      "q_embed_cells_p2" ->
        ((dir: String) => SimOps.cellNearDupPairs(
          SimOps.plantedVectors(embs(dir)),
          centroidPred = SimOps.hashCentroidPred(64), probes = 2)),
      // r15: the probes lever on the hier quantizer (cellArgTopPHier) —
      // the wall to read against q_embed_cells_p2: same 2x-pair-volume
      // contract, ~2·√nlist assignment instead of nlist
      "q_embed_cells_hier_p2" ->
        ((dir: String) => SimOps.cellNearDupPairs(
          SimOps.plantedVectors(embs(dir)),
          centroidPred = SimOps.hashCentroidPred(64), hier = true, probes = 2)),
      // both hier knobs composed (the structure-free-corpus shape): cost
      // to read against hier_p2 — sp2 doubles the supercell scan and the
      // cross-block re-rank rides a window over <= 4 rows per vector
      "q_embed_cells_hier2_p2" ->
        ((dir: String) => SimOps.cellNearDupPairs(
          SimOps.plantedVectors(embs(dir)),
          centroidPred = SimOps.hashCentroidPred(64), hier = true,
          superProbes = 2, probes = 2)),
      // r15 (re-priced r16): the DECLARED dense plant is baseCap-bounded —
      // 500 base ids × 8 = 4,000 media at EVERY decade, a grid-calibration
      // fixture whose cost is pinned by construction; this row now
      // verifies the flat wall + the stable 16 derivation
      "q_media_phash_dense" ->
        ((dir: String) => {
          val m = MultimodalOps.plantPhashCorpusDense(
            MultimodalOps.asMedia(docs(dir)))
          val g = MultimodalOps.autoPhashGrid(m)
          println(s"[famscale] q_media_phash_dense derived grid($dir) = $g")
          MultimodalOps.phashPairs(m, grid = g)
        }),
      // r16: the dense plant's GROWTH law, measured on the UNCAPPED
      // variant with the content period scaled ∝ corpus
      // (strideMod = max(23, media/175): distinct content grows with N,
      // so exact-dup group sizes stay bounded and the re-attach volume
      // stays linear — the r15 lesson applied; at 4,000 media the formula
      // reproduces the calibrated 23, so sf0.1's 1× row anchors to the
      // declared fixture's content)
      "q_media_phash_dense_u" ->
        ((dir: String) => {
          val d = docs(dir)
          val sm = math.max(23L, d.count() * 8 / 175).toInt
          val m = MultimodalOps.plantPhashCorpusDense(
            MultimodalOps.asMedia(d), strideMod = sm, baseCap = 0L)
          val g = MultimodalOps.autoPhashGrid(m)
          println(s"[famscale] q_media_phash_dense_u grid($dir)=$g strideMod=$sm")
          MultimodalOps.phashPairs(m, grid = g)
        }),
      // r16: the curation capstone's decade row (the r14 stretch's "done"
      // bar, unrecorded in r15) — through the DECLARED entry: three
      // cluster legs (two ending in localCheckpoints) joined 4-way on
      // doc_id; the legs are individually measured, this row prices the
      // COMPOSITION at ×10/×100 under both growth modes
      "q_curate_multimodal" ->
        ((dir: String) => graft.SparkEntry.queries("q_curate_multimodal")(spark, dir)),
      // r18: the takedown pass (two CC closures around the tombstone
      // filter — the law: tracks the pairs→clusters chain ~linearly; at
      // production the before-labels are the stored cluster table, so
      // the incremental cost is ONE closure over affected clusters) and
      // the BQ audit (the Hamming leg is the 32×-compressed production
      // scan — integer XOR/popcount per (query, vector), linear in
      // corpus; the float legs are fixed-k metadata)
      "q_dedup_forget" ->
        ((dir: String) => graft.SparkEntry.queries("q_dedup_forget")(spark, dir)),
      "q_bq_recall" ->
        ((dir: String) => SimOps.bqRecall(embs(dir), col("vec_id") < 5)),
      // the blast-radius audit is the pack family's shape (one tokenize
      // behind the Spill barrier + two narrow-count scans + one
      // metadata join) — the law: ~linear in corpus tokens
      "q_forget_blast" ->
        ((dir: String) => graft.SparkEntry.queries("q_forget_blast")(spark, dir)),
      // r19: the post-BPE form — the same packer-audit shape with the
      // count pipeline being the full BPE encode (explode + vocab join)
      // behind the Spill barrier; the law: ~linear in corpus tokens
      "q_forget_blast_bpe" ->
        ((dir: String) => graft.SparkEntry.queries("q_forget_blast_bpe")(spark, dir)),
      // the r18 ANN-audit closers: lsh sweep = 3 lshTopK passes + one
      // brute truth (per-query work, corpus-linear); hard negatives =
      // the knnGraph chain + a band filter (corpus-linear in-cell
      // pairing at self-sized √n cells)
      "q_lsh_recall" ->
        ((dir: String) => SimOps.lshRecallSweep(embs(dir), col("vec_id") < 5)),
      "q_hard_negatives" ->
        ((dir: String) => graft.SparkEntry.queries("q_hard_negatives")(spark, dir)),
      // r19: the IVF-PQ end-to-end recall audit — two declared ivfPqTopK
      // calls + one brute truth pass; the law: each leg is the
      // probed-cells equi-join over 3-small-int code rows (corpus-linear
      // candidate volume at fixed queries), truth is per-query brute
      "q_recall_audit_ivfpq" ->
        ((dir: String) => graft.SparkEntry.queries("q_recall_audit_ivfpq")(spark, dir)))

    // noop-write timing, NOT count(): under count() Catalyst prunes the
    // unobserved columns (strike's md5 reassembly, spans' positions) and
    // elides ordering — the Bench protocol's reason for the noop sink
    def once(f: String => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      f(dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional 4th arg: comma-separated op-name subset (re-measure one
    // family without paying the whole sweep — the Verify-subset pattern)
    val keep = if (args.length > 3)
      Option(args(3).split(',').map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val run = ops.filter { case (n, _) => keep.forall(_.contains(n)) }
    // JIT/codegen warm-up at the smallest SF
    run.foreach { case (_, f) => once(f, "/root/testdata/sf0.001") }
    for ((name, f) <- run; (label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10, "x100" -> x100)) {
      val t = math.min(once(f, dir), once(f, dir))
      val n = f(dir).count() // rows for the growth law, untimed
      println(f"[famscale] $name%-18s $label%-5s: $t%6.1f s (min of 2), rows=$n")
    }

    // r15: the streaming registry re-shard (StreamingOps.rebucketRegistry)
    // — the one piece of streaming state that GROWS with population is the
    // per-bucket collect_list (EmbedBucket.groups); this row bounds when
    // re-sharding itself becomes the cost driver and how large the
    // largest bucket's state row gets per decade. bits re-derives per
    // corpus (autoSignBits — exactly the production re-shard trigger).
    if (keep.forall(_.contains("rebucket"))) {
      import spark.implicits._
      def rebuild(dir: String) = {
        val emb = embs(dir)
        val bits = SimOps.autoSignBits(emb)
        val items = emb.select(col("vec_id"), col("embedding"))
          .as[graft.streaming.EmbedItem]
        (bits, graft.streaming.StreamingOps.rebucketRegistry(items, bits))
      }
      def onceR(dir: String): Double = {
        val t0 = System.nanoTime()
        rebuild(dir)._2.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      onceR("/root/testdata/sf0.001") // warm-up
      for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10, "x100" -> x100)) {
        val t = math.min(onceR(dir), onceR(dir))
        val (bits, df) = rebuild(dir)
        val s = df
          .map { case (b, bucket) =>
            (b, bucket.groups.size.toLong,
              bucket.groups.map(_._4.size.toLong).sum) }
          .toDF("bucket", "groups", "members")
          .agg(count(col("bucket")), max(col("groups")), max(col("members")),
            sum(col("members"))).head
        println(f"[famscale] rebucket           $label%-5s: $t%6.1f s (min of 2), " +
          s"bits=$bits, buckets=${s.getLong(0)}, maxGroupsPerBucket=${s.getLong(1)}, " +
          s"maxMembersPerBucket=${s.getLong(2)}, registryRows=${s.getLong(3)}")
      }
    }
    spark.stop()
  }
}
