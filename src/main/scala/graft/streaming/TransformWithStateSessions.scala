package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.streaming.StatefulSessions.{OpenSession, SessionIn, SessionOut}

/** Event-time sessionization on Spark 4's `transformWithState` API — the
  * successor to `flatMapGroupsWithState` ([[StatefulSessions]]), with the
  * same gap semantics. Differences that matter at scale:
  *
  *  - state lives in named `ValueState` handles on the RocksDB state store
  *    (required by the API) instead of one opaque blob — incremental
  *    checkpointing and state-size metrics come for free;
  *  - timers are first-class: the gap deadline is a registered event-time
  *    timer, re-armed per batch, instead of a single implicit timeout.
  *
  * A session row is emitted when the gap closes it within a batch, or when
  * its deadline timer fires after the watermark passes.
  */
object TransformWithStateSessions {

  class SessionProcessor(gapSec: Int)
      extends StatefulProcessor[Long, SessionIn, SessionOut] {

    @transient private var open: ValueState[OpenSession] = _
    @transient private var deadline: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long](
        "deadline", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def close(uid: Long, o: OpenSession): SessionOut =
      SessionOut(uid, o.start, o.last, o.n, o.sum)

    override def handleInputRows(
        uid: Long,
        rows: Iterator[SessionIn],
        timers: TimerValues): Iterator[SessionOut] = {
      val out = scala.collection.mutable.Buffer.empty[SessionOut]
      var cur = if (open.exists()) Some(open.get()) else None
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        cur = cur match {
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
      cur.foreach { o =>
        open.update(o)
        val newDeadline = o.last.getTime + gapSec * 1000L + 1000L
        if (deadline.exists() && deadline.get() != newDeadline) {
          getHandle.deleteTimer(deadline.get())
        }
        getHandle.registerTimer(newDeadline)
        deadline.update(newDeadline)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        uid: Long,
        timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (open.exists() && deadline.exists() &&
          expired.getExpiryTimeInMs() >= deadline.get()) {
        val o = open.get()
        open.clear()
        deadline.clear()
        Iterator.single(close(uid, o))
      } else Iterator.empty
    }
  }

  /** Streaming sessionization via transformWithState. Requires the RocksDB
    * state store provider
    * (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`). */
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
      .transformWithState(new SessionProcessor(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming exact dedup: drops rows repeating their `dedupCols` within
    * the watermark window — bounded state for at-least-once sources. */
  def dedupStream(
      events: DataFrame,
      tsCol: String,
      dedupCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(dedupCols)
}
