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

  test("coOrderEdges: parts sharing an order pair once, canonical a < b") {
    import spark.implicits._
    val li = Seq((10L, 3L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 5L))
      .toDF("l_orderkey", "l_partkey")
    val got = GraphOps.coOrderEdges(li).as[(Long, Long)].collect().toSet
    // order 11 repeats the (1,2) edge -> still one row; singleton order 12
    // contributes nothing
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("triangleStats: triangle + pendant edge, and the 4-clique") {
    import spark.implicits._
    val e1 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphOps.triangleStats(e1).as[(Long, Long, Long, Long)].head()
    assert(got == ((4L, 4L, 1L, 1L)))
    // K4: every out-neighbor pair of the orientation's sources closes —
    // C(4,3) = 4 triangles from 4 wedges
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val g2 = GraphOps.triangleStats(k4).as[(Long, Long, Long, Long)].head()
    assert(g2 == ((4L, 6L, 4L, 4L)))
  }
}
