package graft

import graft.operators.MergeOps

class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  test("applyChanges: delete drops, update replaces, insert adds") {
    val changes = Seq(
      (1L, "ignored", "D"), (2L, "B2", "U"), (9L, "new", "I"))
      .toDF("k", "v", "op")
    val got = MergeOps.applyChanges(base, changes, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "B2"), (3L, "c"), (9L, "new")))
  }

  test("applyChanges: an empty change batch is the identity") {
    val none = Seq.empty[(Long, String, String)].toDF("k", "v", "op")
    val got = MergeOps.applyChanges(base, none, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("applyChanges: re-applying the same upsert batch is idempotent") {
    val changes = Seq((2L, "B2", "U"), (9L, "new", "I")).toDF("k", "v", "op")
    val once = MergeOps.applyChanges(base, changes, "k")
    val twice = MergeOps.applyChanges(once, changes, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(twice == once.orderBy("k").as[(Long, String)].collect().toSeq)
  }

  // the IVM contract: maintain(viewOf(oldA, oldB), deltas) must equal
  // viewOf(A, B) recomputed from scratch, for ANY split of A and B
  private def ivmCheck(splitA: Long => Boolean, splitB: Long => Boolean): Unit = {
    val a = Seq((1L, 10L, "x"), (2L, 20L, "y"), (3L, 10L, "z"), (4L, 30L, "w"))
      .toDF("a_id", "k", "av")
    val b = Seq((10L, "P"), (20L, "Q"), (30L, "R")).toDF("k", "bv")
    val (aOld, aNew) = (a.filter(r => splitA(r.getLong(0))), a.filter(r => !splitA(r.getLong(0))))
    val (bOld, bNew) = (b.filter(r => splitB(r.getLong(0))), b.filter(r => !splitB(r.getLong(0))))
    val maintained = MergeOps.maintainJoinView(
      aOld.join(bOld, Seq("k")),
      MergeOps.deltaJoin(aOld, aNew, bOld, bNew, Seq("k")))
      .select("a_id", "k", "av", "bv")
      .orderBy("a_id").as[(Long, Long, String, String)].collect().toSeq
    val scratch = a.join(b, Seq("k")).select("a_id", "k", "av", "bv")
      .orderBy("a_id").as[(Long, Long, String, String)].collect().toSeq
    assert(maintained == scratch, s"splitA/splitB broke IVM: $maintained vs $scratch")
  }

  test("deltaJoin: maintained view == from-scratch join for arbitrary splits") {
    ivmCheck(_ <= 2, _ <= 20)   // both sides split
    ivmCheck(_ => true, _ <= 10) // empty delta A
    ivmCheck(_ <= 1, _ => true)  // empty delta B
    ivmCheck(_ => false, _ => false) // everything arrives as delta
  }
}
