package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time inactivity sessionization on the Spark 4 `transformWithState`
  * timer surface: each key keeps an open-session ValueState and ONE
  * registered event-time timer at `last_event + gap`; when the watermark
  * passes it, `handleExpiredTimer` emits the closed session and clears the
  * state. This is the timer-driven twin of [[SessionTracks]] (which closes
  * sessions from the NEXT event of the same key via
  * `flatMapGroupsWithState`) — timers close a session even if its key never
  * speaks again, the case the older API only handles via its coarse
  * per-group timeout.
  *
  * Scale: state is one (n, start, last) triple per OPEN key and exactly one
  * timer per key (each batch deletes the stale timer before registering the
  * new one — leaked timers are a per-key memory creep at 100 TB key
  * cardinality). Requires the RocksDB state store provider and a watermark
  * on the input (the timer clock IS the watermark).
  */
object StreamingTimers {

  /** (user, event ts, value) input row. */
  type In = (Long, Timestamp, Double)

  case class ClosedSession(user_id: Long, n_events: Long,
                           start_ms: Long, last_ms: Long)

  class SessionCloser(gapMs: Long)
      extends StatefulProcessor[Long, In, ClosedSession] {
    require(gapMs > 0, "gap must be positive")
    @transient private var open: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[(Long, Long, Long)]("open",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
                                 timerValues: TimerValues): Iterator[ClosedSession] = {
      var (n, start, last) =
        if (open.exists()) open.get() else (0L, Long.MaxValue, Long.MinValue)
      rows.foreach { case (_, ts, _) =>
        val ms = ts.getTime
        n += 1
        start = math.min(start, ms)
        last = math.max(last, ms)
      }
      if (n > 0) {
        // one live timer per key: replace, never accumulate
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(last + gapMs)
        open.update((n, start, last))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!open.exists()) Iterator.empty
      else {
        val (n, start, last) = open.get()
        open.clear()
        Iterator.single(ClosedSession(key, n, start, last))
      }
    }
  }

  /** Closed sessions (append-mode): input MUST carry a watermark on its
    * timestamp column — the watermark is what expires the timers.
    */
  def closedSessions(events: Dataset[In], gapMs: Long): Dataset[ClosedSession] = {
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new SessionCloser(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
