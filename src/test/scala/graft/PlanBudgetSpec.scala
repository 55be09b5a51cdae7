package graft

import graft.tools.PlanProbe

/** Executed-plan BUDGETS for the expensive declared queries — the r14
  * lesson made a regression gate. That round's manual PlanProbe sweep
  * found three redundant-pipeline shapes (q_basket_rules running its
  * scan→baskets→pair-count chain twice: 5 lineitem scans instead of 3;
  * q_dedup_strike re-tokenizing the corpus for per-doc sizes;
  * q_recall_audit_minhash re-running the whole tokenize+shingle pipeline:
  * 24 scans instead of 18) and the ×100 ReuseExchange failure
  * (pushdown-de-canonicalized repartition subplans re-executing the cell
  * assignment fold per consumer). Nothing pinned those counts, so the
  * same class of bug — a renamed column before an exchange, a new
  * consumer de-canonicalizing a shared subplan, a lost broadcast — would
  * ship silently until the next manual sweep. This spec executes each
  * query at sf0.001 and asserts its plan budget via [[PlanProbe.budget]]:
  *
  *   - `scans` EXACT: parquet-scan count is the duplicate-pipeline smell
  *     (a drop is an improvement — re-pin it deliberately; a rise is the
  *     bug class above).
  *   - `shuffles` as a CEILING: exchange count may legitimately shrink
  *     (better reuse) but never grow unnoticed.
  *   - `reusedExch` as a FLOOR: the reuse that keeps shared pipelines
  *     single-execution must keep firing.
  *
  * Queries whose declared result ends in a localCheckpoint (the graph
  * family: q_triangles_full, q_kcore, q_label_prop, q_media_clusters)
  * are NOT pinnable here — their final QueryExecution reads the
  * checkpointed RDD, not the parquet pipeline; PlanSpec pins their
  * per-round shapes instead.
  */
class PlanBudgetSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Pin(
      scans: Int, maxShuffles: Int, minReusedExch: Int, maxBcast: Int)

  // Baselines measured at HEAD (round 16) with PlanProbe at sf0.001,
  // shufflePartitions = 8 — the spec session's configuration. Round 16
  // re-measured everything: PlanProbe stopped counting the exchange
  // description a ReusedExchange line embeds as a real exchange (the r15
  // ADVICE overcount), so shuffle/broadcast ceilings dropped to TRUE
  // exchange counts; and the hier assignment swapped its blocks broadcast
  // for a shuffle join. `maxBcast` pins the broadcast-exchange ceiling —
  // on the hier queries it is the tripwire that the full-centroid blocks
  // broadcast (the r15 weak scale claim) never returns: re-adding
  // `broadcast(blocks)` raises the count past the pin.
  private val pins: Seq[(String, Pin)] = Seq(
    "q_basket_rules" -> Pin(3, 5, 1, 2),
    "q_recall_audit_minhash" -> Pin(18, 6, 1, 6),
    "q_dedup_strike" -> Pin(6, 6, 0, 2),
    "q_media_phash" -> Pin(5, 5, 3, 3),
    "q_media_phash_dense" -> Pin(5, 5, 3, 3),
    // the capstone's final plan: 3 documents scans (text quote-plant self
    // join + universe) — the two cluster legs end in localCheckpoints
    "q_curate_multimodal" -> Pin(3, 7, 0, 5),
    "q_semdedup" -> Pin(4, 4, 0, 1),
    "q_embed_neardup" -> Pin(8, 7, 4, 5),
    "q_embed_neardup_multi" -> Pin(8, 7, 4, 5),
    // the flat lazy diamond shows a +/-1 exchange-unification race
    // (scans fixed) — its ceilings carry one slack unit
    "q_embed_neardup_cells" -> Pin(10, 7, 4, 6),
    // the probes>1 queries localCheckpoint their assignment; the
    // checkpoint's consumers plan separately, and whether two of their
    // exchanges unify into a ReusedExchange races run-to-run (+/-1
    // observed with identical scans/reuse floors) — ceilings carry one
    // slack unit there, the exact scan pin is the regression-catcher
    "q_embed_neardup_cells_p2" -> Pin(6, 8, 3, 7),
    "q_embed_neardup_cells_hier_p2" -> Pin(6, 9, 3, 7),
    "q_recall_audit_cells" -> Pin(10, 11, 7, 12),
    "q_embed_keep_best" -> Pin(2, 5, 2, 2),
    "q_knn_graph_hier2" -> Pin(5, 7, 2, 5),
    "q_curate_pipeline" -> Pin(3, 3, 1, 2),
    "q_pack_bpe" -> Pin(2, 4, 0, 1),
    "q_bpe_encode" -> Pin(1, 2, 0, 1),
    // r15 closing-bench heavy tail (every remaining pinnable query from
    // the clean suite's top walls — the graph family ends in
    // localCheckpoints and stays with PlanSpec)
    "q_dedup_jaccard" -> Pin(3, 3, 0, 0),
    "q_dedup_contain" -> Pin(4, 3, 0, 0),
    "q_dedup_substring" -> Pin(2, 3, 0, 0),
    "q_dedup_spans" -> Pin(3, 5, 0, 0),
    "q_dedup_verified" -> Pin(6, 5, 1, 2),
    "q_cap_audit_substring" -> Pin(2, 1, 0, 0),
    "q_cap_audit_minhash" -> Pin(3, 2, 0, 0),
    "q_cap_audit_neardup" -> Pin(2, 2, 0, 0),
    "q_cap_audit_phash" -> Pin(1, 2, 0, 0),
    "q_text_tfidf" -> Pin(3, 6, 0, 2),
    "q_bigram_lm" -> Pin(1, 2, 1, 1),
    "q_sim_ivfpq_kmeans" -> Pin(14, 12, 3, 15),
    // r19: the end-to-end IVF-PQ recall audit — two declared-operator
    // calls (shortlist 8/32) + one brute truth pass; reuse floor kept
    // loose (checkpoint-free diamond, unification races run-to-run)
    "q_recall_audit_ivfpq" -> Pin(14, 17, 3, 16),
    // r18: BQ recall audit (integer Hamming leg + float re-rank leg,
    // queries broadcast) and the forget pass's post-CC label joins
    // (the CC loops themselves end in localCheckpoints, pinned by the
    // round-budget tests below)
    "q_bq_recall" -> Pin(8, 11, 0, 8),
    "q_lsh_recall" -> Pin(8, 14, 0, 7),
    "q_dedup_forget" -> Pin(3, 7, 3, 4),
    // r19: the media takedown — ONE documents scan (the tombstone
    // projection; the phash pair chain is Spill-materialized before the
    // forget pass, so the final plan reads stored pairs + the
    // checkpointed closures)
    "q_media_forget" -> Pin(1, 7, 3, 4),
    // the embedding takedown: one embeddings scan (the tombstone
    // projection — the pair chain feeds the checkpointed closures)
    "q_embed_forget" -> Pin(1, 8, 3, 3),
    // one documents scan (the tokenize, Spill-materialized once) + the
    // assignment stage's documented two scans of the narrow count table
    "q_forget_blast" -> Pin(3, 6, 0, 3),
    // the post-BPE form: one documents scan (the encode pipeline behind
    // the same Spill barrier) + the two narrow count-table scans
    "q_forget_blast_bpe" -> Pin(3, 6, 0, 3),
    // the knnGraph chain over the planted corpus + the pre-rank band
    // filter (no extra shuffle — the mining op's whole point)
    "q_hard_negatives" -> Pin(4, 4, 1, 3),
    // r19: the text mining member — the anchor-postings score chain
    // (planted-union corpus read by the anchor and postings branches) +
    // one per-anchor window; band filter is a pre-rank predicate
    "q_hard_negatives_text" -> Pin(6, 4, 0, 2))

  for ((name, pin) <- pins) {
    test(s"plan budget: $name") {
      // another suite's cached frame would swap InMemoryRelation in for
      // parquet scans and silently shrink the counts
      spark.catalog.clearCache()
      val b = PlanProbe.budget(SparkEntry.queries(name)(spark, dir))
      info(b.toString)
      assert(b.scans == pin.scans,
        s"$name parquet-scan count moved: got ${b.scans}, pinned ${pin.scans} — " +
          "a rise is a duplicated pipeline; a drop is an improvement to re-pin")
      assert(b.shuffles <= pin.maxShuffles,
        s"$name shuffle count grew: got ${b.shuffles}, ceiling ${pin.maxShuffles}")
      assert(b.reusedExch >= pin.minReusedExch,
        s"$name exchange reuse regressed: got ${b.reusedExch}, floor ${pin.minReusedExch}")
      assert(b.bcast <= pin.maxBcast,
        s"$name broadcast-exchange count grew: got ${b.bcast}, ceiling ${pin.maxBcast} — " +
          "on hier queries this is the blocks-broadcast tripwire")
    }
  }

  // ---- Per-ROUND budgets for the iterative graph family (r16) ----------
  //
  // The declared graph queries end in localCheckpoints, so their final
  // plans are unpinnable above (scans = 0 by construction) — but their
  // LOOP BODIES are where the re-execution class lives (the r14/r15
  // semDedup/ivfTopK traps). Each test below builds round 1 exactly as
  // the operator does (same cache/checkpoint discipline), executes it,
  // and pins: scans == 0 (a round that scans parquet means the cache or
  // checkpoint broke — the regression this spec exists to catch) and a
  // shuffle ceiling (the round's exchange shape).

  import org.apache.spark.sql.functions.{col, greatest, least}
  import graft.operators.{DedupOps, GraphOps, MultimodalOps}

  private def lineitem =
    spark.read.parquet(s"$dir/lineitem.parquet")

  test("round budget: CC large-star/small-star read the checkpointed edge set, never parquet") {
    spark.catalog.clearCache()
    // the q_media_clusters chain's pre-loop edge set, checkpointed as
    // dedupClustersDetailed's first round sees it
    val m = MultimodalOps.plantPhashCorpus(
      MultimodalOps.asMedia(spark.read.parquet(s"$dir/documents.parquet")))
    val pairs = MultimodalOps.phashPairs(m, grid = MultimodalOps.autoPhashGrid(m))
    val edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    val ls = PlanProbe.budget(DedupOps.largeStar(edges))
    info(s"largeStar: $ls")
    assert(ls.scans == 0, s"large-star half-round scans parquet: $ls")
    assert(ls.shuffles <= 2, s"large-star shuffle count grew: $ls")
    val ss = PlanProbe.budget(
      DedupOps.smallStar(DedupOps.largeStar(edges).drop("changed").localCheckpoint(true)))
    info(s"smallStar: $ss")
    assert(ss.scans == 0, s"small-star half-round scans parquet: $ss")
    assert(ss.shuffles <= 2, s"small-star shuffle count grew: $ss")
  }

  test("round budget: label-propagation round reads the edge cache, never parquet") {
    spark.catalog.clearCache()
    val e = GraphOps.copurchaseEdges(lineitem).repartition(col("u")).persist()
    try {
      e.count()
      val labels0 = e.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      val b = PlanProbe.budget(GraphOps.lpRound(e, labels0))
      info(s"lpRound: $b")
      assert(b.scans == 0, s"lp round scans parquet — the edge cache broke: $b")
      assert(b.shuffles <= 4, s"lp round shuffle count grew: $b")
    } finally e.unpersist(blocking = false)
  }

  test("round budget: k-core peel reads the cached edge set, never parquet") {
    spark.catalog.clearCache()
    val e = GraphOps.copurchaseEdges(lineitem).persist()
    try {
      e.count()
      val (next, keep) = GraphOps.kcoreRound(e, 16)
      try {
        val b = PlanProbe.budget(next)
        info(s"kcoreRound: $b")
        assert(b.scans == 0, s"k-core peel scans parquet — the edge cache broke: $b")
        assert(b.shuffles <= 4, s"k-core peel shuffle count grew: $b")
      } finally keep.unpersist(blocking = false)
    } finally e.unpersist(blocking = false)
  }

  test("round budget: triangle census reads its shared caches, never parquet") {
    spark.catalog.clearCache()
    val (census, caches) = GraphOps.triangleCensus(GraphOps.coOrderEdges(
      lineitem.select(col("l_orderkey"), col("l_partkey"))))
    try {
      val b = PlanProbe.budget(census)
      info(s"triangleCensus: $b")
      assert(b.scans == 0,
        s"a census branch re-derived parquet instead of reading the caches: $b")
      assert(b.shuffles <= 6, s"census shuffle count grew: $b")
    } finally caches.foreach(_.unpersist(blocking = false))
  }
}
