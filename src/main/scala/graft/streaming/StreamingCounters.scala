package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Running per-key totals over the Spark 4 `transformWithState` processor
  * API — the arbitrary-state surface that supersedes
  * `flatMapGroupsWithState` (which [[SessionTracks]] keeps for the
  * session-assembly shape). One processor exercises both state primitives:
  * a `ValueState` for the running (count, micro-unit sum) and a `MapState`
  * for per-event-type counts, each a named column family in the RocksDB
  * state store.
  *
  * Scale design: state lives in the store keyed by user — no
  * driver involvement, partitioned by the grouping key like any stateful
  * streaming op; values are integer micro-units so restarts/replays
  * re-produce identical totals (no float accumulation drift). TTL and
  * timers are deliberately NOT used here — totals are cumulative by
  * contract; give the state a `TTLConfig` at the call site if the keyspace
  * is unbounded (the 100 TB concern: per-user state must either expire or
  * be bounded by the key universe).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (the transformWithState contract).
  */
object StreamingCounters {

  /** (user, event_type, value) input row. */
  type In = (Long, String, Double)

  case class UserTotals(user_id: Long, n_events: Long, value_micros: Long,
                        n_types: Long)

  class RunningTotalsProcessor
      extends StatefulProcessor[Long, In, UserTotals] {
    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var byType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long]("by_type",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, typ, v) =>
        n += 1
        s += math.round(v * 1e6)
        val prev = if (byType.containsKey(typ)) byType.getValue(typ) else 0L
        byType.updateValue(typ, prev + 1)
      }
      totals.update((n, s))
      Iterator.single(UserTotals(key, n, s, byType.keys().size.toLong))
    }
  }

  /** One updated [[UserTotals]] row per key per micro-batch that touched it
    * (OutputMode.Update — the running-aggregate contract).
    */
  def runningTotals(events: Dataset[In]): Dataset[UserTotals] = {
    implicit val outEnc: Encoder[UserTotals] = Encoders.product[UserTotals]
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
