package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-checked integer updates on the path graph 1-2-3") {
    // deg: 1->1, 2->2, 3->1; N=3; teleport = 15*1e6/300 = 50000;
    // init r0 = 1e6 div 3 = 333333 per node
    // round 1: r(2) = 50000 + 85*(333333 + 333333) div 100   = 616666
    //          r(1) = r(3) = 50000 + 85*(333333 div 2) div 100 = 191666
    // round 2: r(2) = 50000 + 85*(191666*2) div 100          = 375832
    //          r(1) = r(3) = 50000 + 85*(616666 div 2) div 100 = 312083
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val got = GraphOps.pageRank(edges, iters = 2, k = 3, scale = 1000000L)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((1, 2L, 375832L), (2, 1L, 312083L), (3, 3L, 312083L)))
  }

  test("pageRank: total mass conserved at ~scale up to integer-floor loss") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val scale = 1000000L
    val total = GraphOps.pageRank(edges, iters = 1, k = 3, scale = scale)
      .agg(sum(col("score"))).as[Long].head()
    // floors lose at most 1 unit each: init (per node), contribution (per
    // edge), damping + teleport (per node) — mass only shrinks, slightly
    assert(total <= scale && total > scale - (3 + 4 + 2 * 3))
  }

  test("copurchaseEdges: symmetric and id spaces disjoint") {
    val e = GraphOps.copurchaseEdges(sf("lineitem"))
    val fwd = e.filter(col("u") < 1000000L)
    val rev = e.filter(col("u") >= 1000000L)
    assert(fwd.count() == rev.count() && fwd.count() > 0)
    assert(fwd.select(col("u"), col("v"))
      .except(rev.select(col("v"), col("u"))).isEmpty)
    // suppliers stay below the part offset; parts above
    assert(fwd.filter(col("v") < 1000000L).isEmpty)
  }
}
