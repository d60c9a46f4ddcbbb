package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom state via
  * `flatMapGroupsWithState` — the Structured Streaming twin of
  * [[graft.operators.EventAnalytics.sessionize]].
  *
  * State per user is the single open session (start, last-seen, count,
  * value sum). Each micro-batch folds its events in timestamp order:
  * a gap greater than `gapSec` closes the open session (emitted downstream)
  * and opens a new one. The open session is emitted when the event-time
  * watermark passes its gap deadline (EventTimeTimeout), so state is
  * bounded by the number of concurrently-active users — the property that
  * keeps a 100 TB/day stream's state finite.
  *
  * Gap semantics match the batch operator exactly: whole-second epoch
  * difference (`unix_timestamp` flooring) strictly greater than `gapSec`
  * starts a new session.
  */
object StatefulSessions {

  case class SessionIn(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Timestamp, last: Timestamp, n: Long, sum: Double)
  case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      session_value: Double)

  /** Streaming sessionization: emits a session row when the session closes
    * (by gap within a batch, or by watermark timeout). `events` must be a
    * streaming frame with user_id/ts/value columns. */
  def sessionizeStream(
      events: DataFrame,
      gapSec: Int = 1800,
      watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process(gapSec) _)
  }

  private[streaming] def close(uid: Long, o: OpenSession): SessionOut =
    SessionOut(uid, o.start, o.last, o.n, o.sum)

  /** The shared session fold: both stateful APIs
    * ([[StatefulSessions.sessionizeStream]] and
    * [[TransformWithStateSessions]]) run exactly this, so their gap
    * semantics cannot diverge. Events fold in timestamp order; a
    * whole-second gap > gapSec closes the open session; a
    * late-but-within-watermark event extends the open session's bounds,
    * never regresses them. Returns (closed sessions, open session). */
  private[streaming] def foldEvents(
      uid: Long,
      current: Option[OpenSession],
      rows: Seq[SessionIn],
      gapSec: Int): (Seq[SessionOut], Option[OpenSession]) = {
    val out = scala.collection.mutable.Buffer.empty[SessionOut]
    var open = current
    rows.sortBy(_.ts.getTime).foreach { e =>
      open = open match {
        case Some(o) if e.ts.getTime / 1000L - o.last.getTime / 1000L > gapSec =>
          out += close(uid, o)
          Some(OpenSession(e.ts, e.ts, 1L, e.value))
        case Some(o) =>
          val start = if (e.ts.before(o.start)) e.ts else o.start
          val last  = if (e.ts.after(o.last)) e.ts else o.last
          Some(OpenSession(start, last, o.n + 1L, o.sum + e.value))
        case None =>
          Some(OpenSession(e.ts, e.ts, 1L, e.value))
      }
    }
    (out.toSeq, open)
  }

  /** Gap deadline for an open session: first instant whose whole-second
    * distance from last-seen exceeds gapSec. */
  private[streaming] def gapDeadlineMs(o: OpenSession, gapSec: Int): Long =
    o.last.getTime + gapSec * 1000L + 1000L

  private def process(gapSec: Int)(
      uid: Long,
      rows: Iterator[SessionIn],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (!rows.hasNext) {
      if (state.hasTimedOut) {
        val closed = state.getOption.map(o => close(uid, o))
        state.remove()
        closed.iterator
      } else Iterator.empty
    } else {
      val (closed, open) = foldEvents(uid, state.getOption, rows.toSeq, gapSec)
      val o = open.get
      state.update(o)
      state.setTimeoutTimestamp(gapDeadlineMs(o, gapSec))
      closed.iterator
    }
  }
}
