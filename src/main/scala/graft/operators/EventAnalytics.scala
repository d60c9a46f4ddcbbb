package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed / analytic operators over the event stream table.
  *
  * Extension beyond the reference (which has no aggregations or window
  * functions — SURVEY.md §2.3); these are the batch twins of the
  * Structured Streaming path in [[graft.streaming.StreamingHistorization]].
  *
  * Scale notes: the tumbling aggregation is a single shuffle on
  * (bucket, event_type) with map-side partial aggregation; the per-user
  * analytics shuffle once on user_id and compute all window functions over
  * the same sort order (one sort, shared by row_number / lag / running
  * sum).
  */
object EventAnalytics {

  /** Tumbling-window aggregation: epoch-aligned buckets of `minutes`, per
    * event type — count, exact decimal sum of value (bit-reproducible
    * across engines, unlike a double fold), and distinct users. */
  def tumblingAgg(events: DataFrame, minutes: Int = 60): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$minutes minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Per-user ordered analytics: sequence number, previous event type, gap
    * seconds since previous event, and running decimal sum of value. One
    * shuffle on user_id; all four functions share one sort (ts, event_id —
    * the id tie-break keeps output deterministic). */
  def userRunning(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events.select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("seq", row_number().over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_sec",
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))).cast("long"))
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
  }

  /** Sessionization: events more than `gapMinutes` apart start a new
    * session; returns per-session bounds and stats. Classic two-window
    * pattern — one shuffle, two sorts share the same partitioning. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    // the first event per user genuinely STARTS a session: the lag-null
    // case must be in the when itself — a coalesce around
    // when(...).otherwise(0) is dead (otherwise(0) never yields NULL),
    // which silently made session_no 0-based
    val prevTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(prevTs.isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(prevTs) > gapMinutes * 60L, 1)
      .otherwise(lit(0))
    events
      .withColumn("is_new", newSession)
      .withColumn("session_no", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("session_value"))
  }

  /** Sessionization via Spark's NATIVE `session_window` — the engine-
    * managed twin of [[sessionize]]: one groupBy, the window merge done
    * by the session-window exec (and available unchanged on a stream,
    * where [[sessionize]]'s global window functions are not). Boundary
    * semantics verified identical to [[sessionize]]'s strict `gap >
    * gapMinutes` split (an event exactly gap after its predecessor
    * EXTENDS the session) — with one precision caveat: this compares
    * full-microsecond timestamps, while [[sessionize]] compares
    * floor-second `unix_timestamp`s, so the two can split differently
    * only when a gap falls strictly inside (gap, gap+1) seconds.
    * No `session_no` (the engine tracks identity internally);
    * `session_end` is the last EVENT time (max ts), not the window's
    * close (last + gap), to match [[sessionize]]'s report. */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("__sw"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("session_value"))
      .drop("__sw")

  /** Cohort retention: users are cohorted by the day of their FIRST event;
    * each (cohort_day, day_offset) cell counts the cohort's users active
    * that many days later, plus the retention ratio against cohort size.
    *
    * Two shuffles total at any scale: one groupBy(user) for first-seen
    * (map-side partial — only (user, min_ts) crosses), one groupBy on the
    * (cohort_day, offset) pairs of the distinct per-user-day activity.
    * The cohort-size join is on cohort_day — tiny (one row per day),
    * broadcast. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy("user_id")
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("active_day"))
      .distinct()
    val cells = activity.join(firstSeen, Seq("user_id"))
      .withColumn("day_offset", datediff(col("active_day"), col("cohort_day")))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
    val sizes = firstSeen.groupBy("cohort_day")
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    cells.join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("cohort_size"), 6))
      .select("cohort_day", "day_offset", "n_active", "cohort_size", "retention")
  }

  /** Top-k event types by exact decimal revenue within each bucketed hour —
    * rank-limited so only k rows per group survive the final exchange. */
  def topTypesPerHour(events: DataFrame, k: Int = 3): DataFrame = {
    val hourly = events.groupBy(
        date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    val w = Window.partitionBy("hour").orderBy(col("sum_value").desc, col("event_type").asc)
    hourly.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Attribution join: each event of `targetType` paired with the SAME
    * user's `sourceType` events in the `lagMinutes` window ending at it
    * (inclusive on both ends) — the click-to-purchase attribution shape.
    *
    * Scale shape: an EQUI-join on user_id (hash-distributed, AQE-skew
    * handled) with the time window as a post-join filter — never a
    * cartesian; both sides are pre-filtered to one event type before the
    * exchange. The streaming twin is [[graft.streaming
    * .StreamingHistorization.intervalJoinStream]], whose watermark bounds
    * the SAME window's state.
    *
    * @return (user_id, target_id, target_ts, target_value, source_id,
    *          source_ts), one row per attributed pair
    */
  def attributionJoin(
      events: DataFrame,
      targetType: String,
      sourceType: String,
      lagMinutes: Int = 5): DataFrame = {
    require(lagMinutes > 0, "lagMinutes must be positive")
    val targets = events.filter(col("event_type") === targetType)
      .select(col("user_id"), col("event_id").as("target_id"),
        col("ts").as("target_ts"), col("value").as("target_value"))
    val sources = events.filter(col("event_type") === sourceType)
      .select(col("user_id"), col("event_id").as("source_id"), col("ts").as("source_ts"))
    targets.join(sources, Seq("user_id"))
      .filter(col("source_ts") >= col("target_ts") - expr(s"INTERVAL $lagMinutes MINUTES")
        && col("source_ts") <= col("target_ts"))
  }

  /** Attribution counts: targets with ≥1 attributed source, with the
    * pair count — the bounded per-target report over [[attributionJoin]]. */
  def attributionCounts(
      events: DataFrame,
      targetType: String,
      sourceType: String,
      lagMinutes: Int = 5): DataFrame =
    attributionJoin(events, targetType, sourceType, lagMinutes)
      .groupBy("target_id")
      .agg(count(lit(1)).as("n_sources"),
        min("source_ts").as("first_source_ts"))

  /** Per-user conversion-funnel times: `t1` is the user's earliest
    * `steps(0)` event, `t(i)` the earliest `steps(i-1)` event STRICTLY
    * after `t(i-1)` — the standard ordered-funnel semantics (ties at the
    * exact same timestamp do not advance the funnel). A user appears iff
    * they completed step 1; later columns are null from the first
    * uncompleted step on.
    *
    * Scale shape: step i is one left equi-join on user_id plus a
    * min-aggregate — k-1 narrow (user, timestamps) joins total, never a
    * per-user event-list collect; each join's right side is pre-filtered
    * to one event type before it shuffles.
    *
    * @return (user_id, t1 .. tN) with N = steps.size
    */
  def funnelTimes(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = events.select(col(userCol).as("user_id"),
      col(typeCol).as("__et"), col(tsCol).as("__ts"))
    var acc = ev.filter(col("__et") === steps.head)
      .groupBy("user_id").agg(min("__ts").as("t1"))
    for (i <- 2 to steps.size) {
      val si = ev.filter(col("__et") === steps(i - 1))
        .select(col("user_id").as("__u"), col("__ts"))
      val carry = "user_id" +: (1 until i).map(j => s"t$j")
      acc = acc.join(si,
          col("user_id") === col("__u") && col("__ts") > col(s"t${i - 1}"), "left")
        .groupBy(carry.map(col): _*)
        .agg(min(col("__ts")).as(s"t$i"))
    }
    acc
  }

  /** Funnel depth report: one row per step with the count of users whose
    * [[funnelTimes]] time for that step is non-null. */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps)
    val counted = times.agg(
      count(col("t1")).as("c1"),
      (2 to steps.size).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    counted.select(explode(array(steps.indices.map(i =>
        struct(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          col(s"c${i + 1}").as("n_users"))): _*)).as("s"))
      .select("s.step", "s.step_name", "s.n_users")
  }
}
