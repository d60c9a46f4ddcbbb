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
}
