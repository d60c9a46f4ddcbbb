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

    override def handleInputRows(
        uid: Long,
        rows: Iterator[SessionIn],
        timers: TimerValues): Iterator[SessionOut] = {
      val cur = if (open.exists()) Some(open.get()) else None
      val (closed, next) = StatefulSessions.foldEvents(uid, cur, rows.toSeq, gapSec)
      next.foreach { o =>
        open.update(o)
        val newDeadline = StatefulSessions.gapDeadlineMs(o, gapSec)
        // re-arm only when the deadline moved: re-registering an existing
        // timer is a warn-and-no-op state-store probe per key per batch
        if (!deadline.exists() || deadline.get() != newDeadline) {
          if (deadline.exists()) getHandle.deleteTimer(deadline.get())
          getHandle.registerTimer(newDeadline)
          deadline.update(newDeadline)
        }
      }
      closed.iterator
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
        Iterator.single(StatefulSessions.close(uid, o))
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
}
