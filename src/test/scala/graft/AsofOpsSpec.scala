package graft

import org.apache.spark.sql.functions._

import graft.functions.{ScoredRow, TopKAgg}
import graft.operators.AsofOps

class AsofOpsSpec extends SparkSpec {
  import spark.implicits._

  private def side(rows: (Long, Long, Long)*) = // (event_id, user_id, ts)
    rows.toDF("event_id", "user_id", "ts")

  test("asofJoin: latest right at-or-before each left, per key") {
    val l = side((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L))
    val r = side((200L, 1L, 40L), (201L, 1L, 49L), (202L, 1L, 51L), (203L, 3L, 1L))
    val got = AsofOps.asofJoin(l, r, "user_id", "ts", "event_id")
      .select(col("event_id"), col("__asof")("event_id").as("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(100L) == Some(201L)) // 49 <= 50, latest
    assert(got(101L) == None)       // nothing at/before 10
    assert(got(102L) == None)       // user 2 has no right rows
  }

  test("asofJoin: equal timestamps are inclusive; ties pick max tieBreak") {
    val l = side((100L, 1L, 50L))
    val r = side((200L, 1L, 50L), (201L, 1L, 50L))
    val got = AsofOps.asofJoin(l, r, "user_id", "ts", "event_id")
      .select(col("__asof")("event_id")).as[Long].head()
    assert(got == 201L)
  }

  test("lastEventBefore matches a JVM-side oracle on the fixture") {
    // Encoding-agnostic read: the oracle compares at the engine's own join
    // precision — raw ns for long-encoded fixtures, stored micros otherwise.
    val evDf = sf("events")
    val rawTs = evDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case dt => graft.operators.EventOps.tsMicros("ts", dt)
    }
    val all = evDf
      .select(col("event_id"), col("user_id"), rawTs.as("ts"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val clicks = all.filter(_._4 == "click").groupBy(_._2)
    val expected = all.filter(_._4 == "purchase").map { case (id, u, t, _) =>
      val prior = clicks.getOrElse(u, Array()).filter(_._3 <= t)
      id -> (if (prior.isEmpty) None
             else Some(prior.maxBy(c => (c._3, c._1))._1))
    }.toMap
    val got = AsofOps.lastEventBefore(sf("events"), "purchase", "click")
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == expected)
    assert(got.values.flatten.nonEmpty)
  }

  test("RangeJoinOps.withinWindowPairs matches a JVM-side inequality join") {
    import graft.operators.RangeJoinOps
    // The engine compares at µs via EventOps.tsMicros — the oracle reads
    // the same projection, so this stays green across fixture encodings.
    val evDf = sf("events")
    val tsUs = graft.operators.EventOps.tsMicros("ts", evDf.schema("ts").dataType)
    val ev = evDf
      .select(col("event_id"), col("user_id"), tsUs.as("ts"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val views = ev.filter(_._4 == "view")
    val purchases = ev.filter(_._4 == "purchase").groupBy(_._2)
    val windowUs = 60L * 60 * 1000 * 1000
    val expected = (for {
      (lid, u, ltUs, _) <- views
      (rid, _, rtUs, _) <- purchases.getOrElse(u, Array())
      if rtUs > ltUs && rtUs <= ltUs + windowUs
    } yield (lid, rid)).toSet
    val got = RangeJoinOps.withinWindowPairs(sf("events"), "view", "purchase")
      .select("l_event_id", "r_event_id").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("TopKAgg keeps the k best with deterministic ties, any merge order") {
    val agg = new TopKAgg(3)
    val rows = Seq(
      ScoredRow(5.0, 2L, 1), ScoredRow(5.0, 1L, 9), ScoredRow(9.0, 7L, 7),
      ScoredRow(1.0, 1L, 1), ScoredRow(7.0, 3L, 3))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    val (a, b) = rows.splitAt(2)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(whole) == agg.finish(merged))
    assert(agg.finish(whole) ==
      Seq(ScoredRow(9.0, 7L, 7), ScoredRow(7.0, 3L, 3), ScoredRow(5.0, 1L, 9)))
  }
}
