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

  private case class Pin(scans: Int, maxShuffles: Int, minReusedExch: Int)

  // Baselines measured at HEAD (round 15) with PlanProbe at sf0.001,
  // shufflePartitions = 8 — the spec session's configuration.
  private val pins: Seq[(String, Pin)] = Seq(
    "q_basket_rules" -> Pin(scans = 3, maxShuffles = 5, minReusedExch = 1),
    "q_recall_audit_minhash" -> Pin(scans = 18, maxShuffles = 7, minReusedExch = 1),
    "q_dedup_strike" -> Pin(scans = 6, maxShuffles = 6, minReusedExch = 0),
    "q_media_phash" -> Pin(scans = 5, maxShuffles = 5, minReusedExch = 3),
    "q_media_phash_dense" -> Pin(scans = 5, maxShuffles = 5, minReusedExch = 3),
    // the capstone's final plan: 3 documents scans (text quote-plant self
    // join + universe) — the two cluster legs end in localCheckpoints
    "q_curate_multimodal" -> Pin(scans = 3, maxShuffles = 7, minReusedExch = 0),
    "q_semdedup" -> Pin(scans = 4, maxShuffles = 4, minReusedExch = 0),
    "q_embed_neardup" -> Pin(scans = 8, maxShuffles = 10, minReusedExch = 4),
    "q_embed_neardup_multi" -> Pin(scans = 8, maxShuffles = 9, minReusedExch = 4),
    // the flat lazy diamond shows the same +/-1 exchange-unification
    // race as the checkpointed variants (8 or 9 observed, scans fixed)
    "q_embed_neardup_cells" -> Pin(scans = 10, maxShuffles = 9, minReusedExch = 4),
    // the probes>1 queries localCheckpoint their assignment; the
    // checkpoint's consumers plan separately, and whether two of their
    // exchanges unify into a ReusedExchange races run-to-run (+/-1
    // observed with identical scans/reuse floors) — ceilings carry one
    // slack unit there, the exact scan pin is the regression-catcher
    "q_embed_neardup_cells_p2" -> Pin(scans = 6, maxShuffles = 9, minReusedExch = 3),
    "q_embed_neardup_cells_hier_p2" -> Pin(scans = 6, maxShuffles = 11, minReusedExch = 3),
    "q_recall_audit_cells" -> Pin(scans = 10, maxShuffles = 16, minReusedExch = 7),
    "q_embed_keep_best" -> Pin(scans = 2, maxShuffles = 6, minReusedExch = 2),
    "q_knn_graph_hier2" -> Pin(scans = 5, maxShuffles = 6, minReusedExch = 2),
    "q_curate_pipeline" -> Pin(scans = 3, maxShuffles = 3, minReusedExch = 1),
    "q_pack_bpe" -> Pin(scans = 2, maxShuffles = 4, minReusedExch = 0),
    "q_bpe_encode" -> Pin(scans = 1, maxShuffles = 2, minReusedExch = 0),
    // r15 closing-bench heavy tail (every remaining pinnable query from
    // the clean suite's top walls — the graph family ends in
    // localCheckpoints and stays with PlanSpec)
    "q_dedup_jaccard" -> Pin(scans = 3, maxShuffles = 3, minReusedExch = 0),
    "q_dedup_contain" -> Pin(scans = 4, maxShuffles = 3, minReusedExch = 0),
    "q_dedup_substring" -> Pin(scans = 2, maxShuffles = 3, minReusedExch = 0),
    "q_dedup_spans" -> Pin(scans = 3, maxShuffles = 5, minReusedExch = 0),
    "q_dedup_verified" -> Pin(scans = 6, maxShuffles = 6, minReusedExch = 1),
    "q_cap_audit_substring" -> Pin(scans = 2, maxShuffles = 1, minReusedExch = 0),
    "q_cap_audit_minhash" -> Pin(scans = 3, maxShuffles = 2, minReusedExch = 0),
    "q_cap_audit_neardup" -> Pin(scans = 2, maxShuffles = 2, minReusedExch = 0),
    "q_cap_audit_phash" -> Pin(scans = 1, maxShuffles = 2, minReusedExch = 0),
    "q_text_tfidf" -> Pin(scans = 3, maxShuffles = 6, minReusedExch = 0),
    "q_bigram_lm" -> Pin(scans = 1, maxShuffles = 3, minReusedExch = 1),
    "q_sim_ivfpq_kmeans" -> Pin(scans = 14, maxShuffles = 12, minReusedExch = 3))

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
    }
  }
}
