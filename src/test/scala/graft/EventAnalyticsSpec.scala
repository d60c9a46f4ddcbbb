package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = graft.sources.Tables.events(spark, sfDir)

  test("tumbling agg partitions all events into buckets") {
    val agg = EventAnalytics.tumblingAgg(events, minutes = 60)
    assert(agg.agg(sum($"n_events")).as[Long].head() === events.count())
    assert(agg.filter($"window_start".isNull).count() === 0)
  }

  test("userRunning: seq is dense per user, running sum is monotone for positive values") {
    val r = EventAnalytics.userRunning(events)
    val oneUser = r.filter($"user_id" === r.select("user_id").as[Long].head())
      .orderBy("seq")
    val seqs = oneUser.select("seq").as[Int].collect()
    assert(seqs.toSeq === (1 to seqs.length))
    val firstGap = oneUser.select("gap_sec").as[Option[Long]].collect().head
    assert(firstGap.isEmpty) // first event has no predecessor
  }

  test("sessionize: session count between 1 and event count per user") {
    val s = EventAnalytics.sessionize(events, gapMinutes = 30)
    val perUser = s.groupBy("user_id").count()
    val ev = events.groupBy("user_id").count().withColumnRenamed("count", "n_ev")
    val joined = perUser.join(ev, "user_id")
      .filter($"count" < 1 || $"count" > $"n_ev")
    assert(joined.count() === 0)
    // sessions don't overlap: end >= start
    assert(s.filter($"session_end" < $"session_start").count() === 0)
  }

  test("cohort retention: offset-0 cell is the full cohort; ratios bounded") {
    val r = EventAnalytics.cohortRetention(events)
    // every user's first day is an active day, so day_offset 0 retention = 1
    val day0 = r.filter($"day_offset" === 0)
    assert(day0.count() > 0)
    assert(day0.filter($"retention" =!= 1.0).count() === 0)
    assert(day0.filter($"n_active" =!= $"cohort_size").count() === 0)
    // no negative offsets (nothing active before its cohort day), ratios in (0, 1]
    assert(r.filter($"day_offset" < 0).count() === 0)
    assert(r.filter($"retention" <= 0 || $"retention" > 1).count() === 0)
    // cohort sizes partition the user base
    val users = events.select("user_id").distinct().count()
    assert(r.select("cohort_day", "cohort_size").distinct()
      .agg(sum("cohort_size")).as[Long].head() === users)
  }

  test("top types per hour returns at most k per hour, ranked") {
    val t = EventAnalytics.topTypesPerHour(events, k = 2)
    val over = t.groupBy("hour").count().filter($"count" > 2)
    assert(over.count() === 0)
    assert(t.filter($"rank" < 1 || $"rank" > 2).count() === 0)
  }

  test("funnel: strict ordering, ties do not advance, depths monotone") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1 completes A -> B -> C in order
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 10:05:00")),
      (1L, "C", ts("2024-01-01 10:10:00")),
      // u2: B before A, then no B after A -> depth 1
      (2L, "B", ts("2024-01-01 09:00:00")),
      (2L, "A", ts("2024-01-01 09:30:00")),
      // u3: B exactly AT A's time -> tie does not advance -> depth 1
      (3L, "A", ts("2024-01-01 08:00:00")),
      (3L, "B", ts("2024-01-01 08:00:00")),
      // u4 never does A -> absent entirely
      (4L, "B", ts("2024-01-01 07:00:00")),
      (4L, "C", ts("2024-01-01 07:30:00"))
    ).toDF("user_id", "event_type", "ts")
    val times = EventAnalytics.funnelTimes(ev, "user_id", "event_type", "ts",
      Seq("A", "B", "C")).collect().map(r => r.getLong(0) -> r).toMap
    assert(times.keySet === Set(1L, 2L, 3L))
    assert(!times(1L).isNullAt(1) && !times(1L).isNullAt(2) && !times(1L).isNullAt(3))
    assert(times(2L).isNullAt(2) && times(3L).isNullAt(2))
    val counts = EventAnalytics.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("A", "B", "C")).orderBy("step")
      .as[(Int, String, Long)].collect()
    assert(counts.toSeq === Seq((1, "A", 3L), (2, "B", 1L), (3, "C", 1L)))
    // depths can only shrink
    assert(counts.map(_._3).sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
  }

  test("sessionizeNative matches sessionize, including the exact-gap boundary") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: second event EXACTLY 30 min after the first -> same session
      // (both forms: strict > splits); third 30:01 after second -> split
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 11L, ts("2024-01-01 10:30:00"), 2.0),
      (1L, 12L, ts("2024-01-01 11:00:01"), 4.0),
      // u2: single event
      (2L, 20L, ts("2024-01-01 09:00:00"), 8.0),
      // u3: chain of sub-gap steps spanning > gap total -> ONE session
      (3L, 30L, ts("2024-01-01 08:00:00"), 1.0),
      (3L, 31L, ts("2024-01-01 08:20:00"), 1.0),
      (3L, 32L, ts("2024-01-01 08:40:00"), 1.0),
      (3L, 33L, ts("2024-01-01 09:00:00"), 1.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val native = EventAnalytics.sessionizeNative(ev, 30)
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
    val classic = EventAnalytics.sessionize(ev, 30)
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
    assert(native.count() === 4)
    assert(native.exceptAll(classic).count() === 0)
    assert(classic.exceptAll(native).count() === 0)
    // and on the real fixture (whole-second gaps only)
    val events = graft.sources.Tables.events(spark, sfDir)
    val n = EventAnalytics.sessionizeNative(events, 30)
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
    val c = EventAnalytics.sessionize(events, 30)
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
    assert(n.exceptAll(c).count() === 0)
    assert(c.exceptAll(n).count() === 0)
  }
}
