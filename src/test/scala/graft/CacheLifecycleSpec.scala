package graft

import org.apache.spark.sql.functions._

/** Every iterative/multi-consumer operator that persists intermediate state
  * must release it before returning (see [[graft.Local]]): at 100 TB a
  * per-query cache leak evicts useful cache or OOMs executors long before
  * correctness is at stake. Pinned here via `getPersistentRDDs` — the set of
  * persisted RDDs after running each caching operator end-to-end must be no
  * larger than before it.
  */
class CacheLifecycleSpec extends SparkSpec {

  private def leakedAfter(run: => Unit): Int = {
    val before = spark.sparkContext.getPersistentRDDs.size
    run
    spark.sparkContext.getPersistentRDDs.size - before
  }

  private val dir = "/root/testdata/sf0.001"

  test("bpeMerges releases every training round") {
    assert(leakedAfter {
      operators.TextOps.bpeMerges(sf("documents")).collect()
    } === 0)
  }

  test("bpeEncode releases the trained state") {
    assert(leakedAfter {
      operators.TextOps.bpeEncode(sf("documents")).collect()
    } === 0)
  }

  test("pageRank releases degrees and every round") {
    assert(leakedAfter {
      operators.GraphOps.pageRank(
        operators.GraphOps.copurchaseEdges(sf("lineitem")), iters = 2, k = 5).collect()
    } === 0)
  }

  test("triangleStats releases edges, orientation, and wedges") {
    assert(leakedAfter {
      operators.GraphOps.triangleStats(
        operators.GraphOps.coOrderEdges(sf("lineitem"))).collect()
    } === 0)
  }

  test("q_tpch_q15 releases the revenue view") {
    assert(leakedAfter {
      SparkEntry.queries("q_tpch_q15")(spark, dir).collect()
    } === 0)
  }

  test("histogramQuantiles holds no cached state") {
    assert(leakedAfter {
      operators.StatsOps.histogramQuantiles(
        sf("lineitem"), "l_quantity", nb = 16, qs = Seq(0.5, 0.9)).collect()
    } === 0)
  }

  test("dedupClusters releases superseded rounds; only the final checkpoint survives") {
    import spark.implicits._
    // a 9-node path takes several large/small-star rounds — each round's
    // two local checkpoints must be released as soon as superseded
    val pairs = (1L to 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assert(leakedAfter {
      operators.DedupOps.dedupClusters(pairs).collect()
    } <= 1)
  }

  test("GLOBAL sweep: no declared query leaks cache (sf0.001, whole surface)") {
    // the regression guard for every FUTURE query: execute the entire
    // declared surface and bound net persistent-RDD growth by the known
    // by-design survivors (dedupClusters' final local checkpoint, one per
    // clustering consumer — unpersisting it would be unrecoverable)
    val byDesign = 5 // q_dedup_clusters/q_dedup_keep_best/q_dedup_incremental
                     // final cluster checkpoints + the q_label_prop label
                     // state and q_kcore core checkpoints
    val leaked = leakedAfter {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => fail(s"$name failed at sf0.001: ${e.getMessage}") }
      }
    }
    assert(leaked <= byDesign, s"net persistent RDDs grew by $leaked (> $byDesign)")
  }
}
