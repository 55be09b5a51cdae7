package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ms(hhmm: String): Long =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00").getTime

  /** Rows shaped like the events table with raw-ns ts (nanosAsLong read). */
  private def ev(rows: (Long, Long, String, Double)*) =
    rows.map { case (id, tMs, typ, v) => (id, tMs * 1000000L, 7L, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("normalizeTs converts raw ns longs to timestamps, passes timestamps through") {
    val df = ev((1L, ms("10:00"), "click", 1.0))
    val once = EventOps.normalizeTs(df)
    assert(once.schema("ts").dataType.typeName == "timestamp")
    val twice = EventOps.normalizeTs(once)
    assert(twice.select("ts").head() == once.select("ts").head())
  }

  test("gapFillHourly: every (type, hour) cell in the span exists, zeros for gaps") {
    val df = ev(
      (1L, ms("10:05"), "click", 1.0),
      (2L, ms("13:55"), "click", 2.5), // hours 11 and 12 are empty
      (3L, ms("10:30"), "view", 4.0))  // view only in hour 10
    val got = EventOps.gapFillHourly(df)
      .select(hour(col("bucket")), col("event_type"), col("n_events"), col("sum_value"))
      .as[(Int, String, Long, Double)].collect().toSeq
    // 4-hour span x 2 types = 8 cells, original 3 aggregates intact
    assert(got.size == 8)
    assert(got.toSet == Set(
      (10, "click", 1L, 1.0), (11, "click", 0L, 0.0),
      (12, "click", 0L, 0.0), (13, "click", 1L, 2.5),
      (10, "view", 1L, 4.0), (11, "view", 0L, 0.0),
      (12, "view", 0L, 0.0), (13, "view", 0L, 0.0)))
  }

  test("sessionize: gap splits sessions, ties broken by event_id") {
    val df = ev(
      (1L, ms("10:00"), "a", 1.0), (2L, ms("10:10"), "a", 1.0),
      (3L, ms("11:30"), "a", 1.0)) // > 30 min after event 2
    val got = EventOps.sessionStats(df, gapSeconds = 1800)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 2L, 3L))) // 2 sessions, 3 events
  }

  test("tumblingAgg buckets by hour with per-type counts") {
    val df = ev(
      (1L, ms("10:05"), "click", 1.0), (2L, ms("10:55"), "click", 2.0),
      (3L, ms("11:05"), "view", 4.0))
    val got = EventOps.tumblingAgg(df, "hour")
      .select("event_type", "n_events", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("click", 2L, 3.0), ("view", 1L, 4.0)))
  }

  test("slidingAgg: every event lands in width/slide windows") {
    val df = ev((1L, ms("10:05"), "click", 1.0))
    val got = EventOps.slidingAgg(df, widthSec = 3600, slideSec = 1800)
      .select("bucket_s").as[Long].collect().toSeq
    // 10:05 belongs to windows starting 09:30 and 10:00
    assert(got.length == 2)
    assert(got.map(_ % 1800).forall(_ == 0))
  }

  test("sessionStatsNative: matches sessionStats, including at the exact-gap boundary") {
    // gaps of 29 and 31 minutes around a 30-minute threshold
    val offBoundary = ev(
      (1L, ms("10:00"), "a", 1.0), (2L, ms("10:29"), "a", 1.0), // same session
      (3L, ms("11:10"), "a", 1.0))                              // 41 min -> new
    val a = EventOps.sessionStats(offBoundary, 1800).as[(Long, Long, Long)].collect().toSeq
    val b = EventOps.sessionStatsNative(offBoundary, 1800).as[(Long, Long, Long)].collect().toSeq
    assert(a == b && a == Seq((7L, 2L, 3L)))
    // exactly 30 minutes apart: BOTH forms keep one session — Spark's
    // session_window merges touching windows, matching the lag form's
    // `diff > gap` semantics (this pin is why they can share an oracle)
    val boundary = ev((1L, ms("10:00"), "a", 1.0), (2L, ms("10:30"), "a", 1.0))
    assert(EventOps.sessionStats(boundary, 1800)
      .as[(Long, Long, Long)].head() == ((7L, 1L, 2L)))
    assert(EventOps.sessionStatsNative(boundary, 1800)
      .as[(Long, Long, Long)].head() == ((7L, 1L, 2L)))
  }

  test("runningStats: cumulative bp sums, lag, and gaps per user") {
    val df = ev(
      (1L, ms("10:00"), "a", 1.5),
      (2L, ms("10:10"), "a", 2.25),
      (3L, ms("11:00"), "a", 0.5))
    val got = EventOps.runningStats(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // bp values 15000, 22500, 5000; gaps 0, 10 min, 50 min (in us)
    assert(got == Seq(
      (7L, 1L, 15000L, 0L, 0L),
      (7L, 2L, 37500L, 15000L, 600000000L),
      (7L, 3L, 42500L, 22500L, 3000000000L)))
  }

  test("funnel: stages count only when strictly after the previous stage") {
    val rows = Seq(
      // user 1: clean view -> click -> purchase
      (1L, ms("10:00"), 1L, "view"), (2L, ms("10:10"), 1L, "click"),
      (3L, ms("10:20"), 1L, "purchase"),
      // user 2: click BEFORE first view doesn't count; purchase without a
      // counted click doesn't either
      (4L, ms("10:00"), 2L, "click"), (5L, ms("10:10"), 2L, "view"),
      (6L, ms("10:20"), 2L, "purchase"),
      // user 3: never viewed
      (7L, ms("10:00"), 3L, "purchase"),
      // user 4: purchase before the click -> stops at stage 2
      (8L, ms("10:00"), 4L, "view"), (9L, ms("10:05"), 4L, "purchase"),
      (10L, ms("10:10"), 4L, "click"))
      .map { case (id, tMs, u, typ) => (id, tMs * 1000000L, u, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.funnel(rows, Seq("view", "click", "purchase"))
      .select("user_id", "stage_reached")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 1L), (3L, 0L), (4L, 2L)))
    // completion times: -1 marks never-reached stages
    val u2 = EventOps.funnel(rows, Seq("view", "click", "purchase"))
      .filter($"user_id" === 2L)
      .select("t1_us", "t2_us", "t3_us").as[(Long, Long, Long)].head()
    assert(u2 == ((ms("10:10") * 1000L, -1L, -1L)))
  }

  test("retentionCohorts: offsets measured from each user's first day") {
    def day(d: Int, hh: String) = Timestamp.valueOf(f"2026-01-$d%02d $hh:00:00").getTime
    val rows = Seq(
      // user 1: cohort Jan 1, active day 0, 2 (twice -> still one count)
      (1L, day(1, "09"), 1L), (2L, day(3, "10"), 1L), (3L, day(3, "11"), 1L),
      // user 2: cohort Jan 2, active day 0 only
      (4L, day(2, "09"), 2L),
      // user 3: cohort Jan 1, active day 0 and 1
      (5L, day(1, "23"), 3L), (6L, day(2, "01"), 3L))
      .map { case (id, tMs, u) => (id, tMs * 1000000L, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.retentionCohorts(rows)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2026-01-01", 0L, 2L), // users 1 and 3
      ("2026-01-01", 1L, 1L), // user 3
      ("2026-01-01", 2L, 1L), // user 1 (deduped to one day)
      ("2026-01-02", 0L, 1L))) // user 2
  }

  test("hourlyAnomalies: flags a planted spike, skips warm-up and mild jitter") {
    val base = ms("00:00")
    // hours 0..35 with counts cycling 2,3,4 — trailing-24 lower median 3,
    // MAD 1 — and a 30-event spike at hour 30
    val rows = (0 until 36).flatMap { h =>
      val c = if (h == 30) 30 else 2 + (h % 3)
      (0 until c).map(i => (h * 100L + i, base + h * 3600000L + i * 1000L, "click", 1.0))
    }
    val got = EventOps.hourlyAnomalies(ev(rows: _*))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // only the spike hour is anomalous: the cycle stays within MAD x 3,
    // hours < 12 are warm-up, and the robust trailing stats absorb the
    // spike for later hours
    assert(got == Seq((base / 1000 + 30 * 3600, "click", 30L, 3L, 1L)))
  }

  test("cusumShifts: hand-computed level shift alarms, flat series stays silent") {
    // type a: 2/hour for 6 hours then 30/hour for 2 — S=72, C=8, slack
    // S div 2 = 36. Low hours drift s_lo by 72-36-16=20; the step drifts
    // s_hi by 240-72-36=132, crossing 2S=144 on its second hour only.
    // type b: flat 3/hour — drift 12-12-6 < 0 on both sides, all zeros.
    val rows = Seq.newBuilder[(Long, Long, String, Double)]
    var id = 0L
    for (h <- 10 to 15; _ <- 1 to 2) { id += 1; rows += ((id, ms(f"$h%02d:00"), "a", 1.0)) }
    for (h <- 16 to 17; _ <- 1 to 30) { id += 1; rows += ((id, ms(f"$h%02d:00"), "a", 1.0)) }
    for (h <- 10 to 13; _ <- 1 to 3) { id += 1; rows += ((id, ms(f"$h%02d:00"), "b", 1.0)) }
    val got = EventOps.cusumShifts(ev(rows.result(): _*))
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    def sec(h: Int) = ms(f"$h%02d:00") / 1000
    val expectA =
      (10 to 15).map(h => ("a", sec(h), 2L, 0L, 20L * (h - 9), false)) ++
        Seq(("a", sec(16), 30L, 132L, 0L, false), ("a", sec(17), 30L, 264L, 0L, true))
    assert(got.filter(_._1 == "a") == expectA)
    assert(got.filter(_._1 == "b") ==
      (10 to 13).map(h => ("b", sec(h), 3L, 0L, 0L, false)))
  }

  test("rollupState merge: any split of the table maintains the exact view") {
    val rows = (1 to 30).map(i =>
      (i.toLong, ms("10:00") + i * 60000L, if (i % 2 == 0) "click" else "view", i * 1.1))
    val all = ev(rows: _*)
    val full = EventOps.rollupState(all)
      .orderBy($"event_type").as[(String, Long, Long)].collect().toSeq
    // 3-way split merged pairwise (tests associativity, not just 2-way)
    val parts = Seq(
      ev(rows.take(10): _*), ev(rows.slice(10, 17): _*), ev(rows.drop(17): _*))
    val merged = EventOps.mergeRollupStates(
      EventOps.mergeRollupStates(
        EventOps.rollupState(parts(0)), EventOps.rollupState(parts(1))),
      EventOps.rollupState(parts(2)))
      .as[(String, Long, Long)].collect().toSeq
    assert(merged == full)
    assert(full.map(_._2).sum == 30L)
  }

  test("distinctState merge: split-and-merge equals from-scratch COUNT DISTINCT") {
    // users repeat within and across split boundaries (i % 7) — the case a
    // raw distinct count cannot merge through and the multiplicity state can
    val rows = (1 to 30).map(i =>
      (i.toLong, (ms("10:00") + i * 60000L) * 1000000L, (i % 7).toLong,
        if (i % 2 == 0) "click" else "view", i * 1.1, "{}"))
    def frame(rs: Seq[(Long, Long, Long, String, Double, String)]) =
      rs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val full = EventOps.distinctView(EventOps.distinctState(frame(rows)))
      .as[(String, Long, Long)].collect().toSeq
    val parts = Seq(rows.take(10), rows.slice(10, 17), rows.drop(17)).map(frame)
    val merged = EventOps.distinctView(EventOps.mergeDistinctStates(
      EventOps.mergeDistinctStates(
        EventOps.distinctState(parts(0)), EventOps.distinctState(parts(1))),
      EventOps.distinctState(parts(2))))
      .as[(String, Long, Long)].collect().toSeq
    assert(merged == full)
    // 7 distinct users per type despite 15 events each: dedup really happened
    assert(full.map(_._2) == Seq(7L, 7L) && full.map(_._3).sum == 30L)
  }

  test("percentiles: hand-checked median and p95") {
    val df = ev((1 to 5).map(i => (i.toLong, ms("10:00") + i, "x", i.toDouble)): _*)
    val r = EventOps.percentiles(df).head()
    assert(r.getAs[Long]("p50_bp") == 30000L)  // median of 1..5 = 3
    assert(r.getAs[Long]("p95_bp") == 48000L)  // 4.8 at linear interpolation
  }

  test("extrema IVM: deleting the current min promotes the runner-up") {
    // base values per type "a": 1.0 x2, 2.0, 3.0, 9.0
    val base = ev(
      (1L, ms("10:00"), "a", 1.0), (2L, ms("10:01"), "a", 1.0),
      (3L, ms("10:02"), "a", 2.0), (4L, ms("10:03"), "a", 3.0),
      (5L, ms("10:04"), "a", 9.0))
    val st = EventOps.extremaState(base, k = 3)
    // delete ONE copy of 1.0: min stays (multiplicity 2 -> 1)
    val d1 = EventOps.extremaState(ev((1L, ms("10:00"), "a", 1.0)), k = 3)
      .withColumn("mult", -col("mult"))
    val v1 = EventOps.extremaView(EventOps.mergeExtremaStates(st, d1, k = 3)).head()
    assert(v1.getLong(1) == 10000L && v1.getLong(2) == 90000L)
    // delete the second copy too: min promotes to 2.0
    val d2 = EventOps.extremaState(
      ev((1L, ms("10:00"), "a", 1.0), (2L, ms("10:01"), "a", 1.0)), k = 3)
      .withColumn("mult", -col("mult"))
    val v2 = EventOps.extremaView(EventOps.mergeExtremaStates(st, d2, k = 3)).head()
    assert(v2.getLong(1) == 20000L && v2.getLong(2) == 90000L)
    // insert below the min: new min without touching the buffer's hi side
    val ins = EventOps.extremaState(ev((9L, ms("11:00"), "a", 0.5)), k = 3)
    val v3 = EventOps.extremaView(EventOps.mergeExtremaStates(st, ins, k = 3)).head()
    assert(v3.getLong(1) == 5000L && v3.getLong(2) == 90000L)
  }

  test("extrema IVM: draining a whole side goes NULL, never wrong") {
    // k=2 buffer holds lows {1.0, 2.0}; deleting both drains the lo side
    // while 3.0 and 9.0 survive in the data (truncated away) — min must
    // be NULL (recompute signal), max still answers
    val base = ev(
      (1L, ms("10:00"), "a", 1.0), (2L, ms("10:01"), "a", 2.0),
      (3L, ms("10:02"), "a", 3.0), (4L, ms("10:03"), "a", 9.0))
    val st = EventOps.extremaState(base, k = 2)
    val del = EventOps.extremaState(
      ev((1L, ms("10:00"), "a", 1.0), (2L, ms("10:01"), "a", 2.0)), k = 2)
      .withColumn("mult", -col("mult"))
    val v = EventOps.extremaView(EventOps.mergeExtremaStates(st, del, k = 2)).head()
    assert(v.isNullAt(1), "drained lo side must yield NULL min")
    assert(v.getLong(2) == 90000L)
  }

  test("ewmaHourly: hand-checked binary decay over a grid with a hole") {
    // hours 10, 11, 13 have events; hour 12 is a genuine zero (gap-filled)
    val df = ev(
      (1L, ms("10:00"), "a", 1.0),
      (2L, ms("11:00"), "a", 2.0),
      (3L, ms("13:00"), "a", 4.0))
    val rows = EventOps.ewmaHourly(df)
      .select("v_bp", "ewma_num", "ewma_den")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (10000L, 10000L * 128, 128L),                                   // 10:00
      (20000L, 20000L * 128 + 10000L * 64, 192L),                     // 11:00
      (0L, 20000L * 64 + 10000L * 32, 224L),                          // 12:00
      (40000L, 40000L * 128 + 20000L * 32 + 10000L * 16, 240L)))      // 13:00
  }

  test("ewmaHourly: each type gets the full spine; zeros weigh in as data") {
    val df = ev(
      (1L, ms("10:00"), "a", 1.0),
      (2L, ms("12:00"), "b", 3.0))
    val rows = EventOps.ewmaHourly(df)
      .as[(String, Long, Long, Long, Long)].collect()
    // 3 grid hours x 2 types
    assert(rows.length == 6)
    val b12 = rows.find(r => r._1 == "b" && r._3 == 30000L).get
    // b's hours 10 and 11 are zero rows, present in the denominator
    assert(b12._4 == 30000L * 128 && b12._5 == 128L + 64L + 32L)
  }

  test("typeTransitions: per-user lag pairs, row shares in bp") {
    val df = ev(
      // user timelines are interleaved on ts but partition by user
      (1L, ms("10:00"), "click", 0.0), (2L, ms("10:05"), "view", 0.0),
      (3L, ms("10:10"), "purchase", 0.0))
      .unionByName(ev((4L, ms("10:00"), "click", 0.0), (5L, ms("10:01"), "view", 0.0))
        .withColumn("user_id", lit(8L)))
      .unionByName(ev((6L, ms("10:00"), "view", 0.0), (7L, ms("10:02"), "click", 0.0))
        .withColumn("user_id", lit(9L)))
    val got = EventOps.typeTransitions(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(("click", "view")) == ((2L, 10000L)))
    assert(got(("view", "purchase")) == ((1L, 5000L)))
    assert(got(("view", "click")) == ((1L, 5000L)))
    assert(got.size == 3)
  }

  test("seasonalProfile: hand-computed shares, means, and deviations") {
    val df = ev(
      (1L, ms("10:05"), "click", 1.0), (2L, ms("10:40"), "click", 3.0),
      (3L, ms("11:10"), "click", 2.0),
      (4L, ms("10:20"), "view", 5.0))
    val got = EventOps.seasonalProfile(df)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // click: hour 10 = 2 of 3 events (6666 bp), mean (10000+30000)/2 = 20000
    //        type mean = 60000/3 = 20000 -> dev 0
    assert(got(("click", 10L)) == ((2L, 6666L, 20000L, 0L)))
    // click hour 11: 1 of 3 (3333 bp), mean 20000, dev 0
    assert(got(("click", 11L)) == ((1L, 3333L, 20000L, 0L)))
    // view: single hour holds 100% of its type
    assert(got(("view", 10L)) == ((1L, 10000L, 50000L, 0L)))
    assert(got.size == 3)
  }

  test("seasonalProfile: negative value sums FLOOR (DuckDB // rule, not div)") {
    val df = ev(
      (1L, ms("10:05"), "click", -1.0), (2L, ms("10:40"), "click", -2.0),
      (3L, ms("10:50"), "click", -2.0))
    val got = EventOps.seasonalProfile(df).head()
    // v_bp = -50000 over 3 events: floor(-16666.67) = -16667; truncation
    // (`div`) would give -16666 and diverge from the DuckDB `//` mirror
    assert(got.getLong(4) == -16667L)
    assert(got.getLong(5) == 0L)
  }
}
