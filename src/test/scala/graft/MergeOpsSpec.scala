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
}
