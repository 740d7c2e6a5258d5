package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ops.Trajectory.impliedSpeed]]: per-ping implied
  * speed and teleport flagging as pings ARRIVE, via a Spark 4
  * `transformWithState` processor holding exactly one row of state per track
  * — the last accepted ping. The batch operator answers "which historical
  * jumps were implausible"; this one raises the alert while the vessel (or
  * the GPS glitch / MMSI collision) is still transmitting, which is when a
  * monitoring consumer wants it.
  *
  * Semantics contract with the batch twin: identical micro-degree integer
  * distance math, the same float chain (`sqrt → ×111.195 → /1e6 → ×3.6e6 →
  * /dt`), the same HALF-UP rounding to 6 decimals — on in-order input the
  * emitted rows are bit-identical to the batch operator's (asserted in
  * `StreamingSpec`). Divergence is confined to out-of-order arrivals: a ping
  * older than the last accepted one cannot have a well-defined "previous"
  * without replaying history, so it emits with `is_late = true`, null
  * kinematics, and does NOT regress the state — the monitoring-stream
  * convention (late data belongs to the batch re-run, not the live alert).
  *
  * Scale: state is one fixed-size tuple per track key in the RocksDB store,
  * partitioned by key like any stateful op; no timers, no growth with ping
  * volume. Give `TTLConfig` a retention at the call site if the track
  * universe is unbounded. Requires the RocksDB state store provider (the
  * transformWithState contract).
  */
object StreamingTrajectory {

  /** (track_id, ping_id, ts_ms, lat, lon) input row. */
  type Ping = (Long, Long, Long, Double, Double)

  case class SpeedRow(track_id: Long, ping_id: Long, ts_ms: Long,
                      gap_ms: Option[Long], dist_km: Option[Double],
                      speed_kmh: Option[Double], is_teleport: Option[Boolean],
                      is_late: Boolean)

  private def round6(v: Double): Double =
    new JBigDecimal(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  class SpeedProcessor(teleportKmh: Double)
      extends StatefulProcessor[Long, Ping, SpeedRow] {
    // (ts_ms, lat micro-degrees, lon micro-degrees) of the last accepted ping
    @transient private var lastPing: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastPing = getHandle.getValueState[(Long, Long, Long)]("last_ping",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ping],
                                 timerValues: TimerValues): Iterator[SpeedRow] = {
      // a micro-batch delivers rows unordered; evaluate in event-time order
      // (ping id breaks ts ties) so intra-batch hops chain correctly
      val ordered = rows.toArray.sortBy(p => (p._3, p._2))
      val out = Array.newBuilder[SpeedRow]
      ordered.foreach { case (_, pingId, tsMs, lat, lon) =>
        val latu = math.round(lat * 1e6)
        val lonu = math.round(lon * 1e6)
        (if (lastPing.exists()) Some(lastPing.get()) else None) match {
          case Some((pTs, _, _)) if tsMs < pTs =>
            out += SpeedRow(key, pingId, tsMs, None, None, None, None,
              is_late = true)
          case Some((pTs, pLatu, pLonu)) =>
            val dlat = latu - pLatu
            val dlonAbs = math.abs(lonu - pLonu)
            val dlon = if (dlonAbs > 180000000L) 360000000L - dlonAbs else dlonAbs
            val distKm =
              math.sqrt((dlat * dlat + dlon * dlon).toDouble) * 111.195 / 1000000.0
            val dtMs = tsMs - pTs
            val speed =
              if (dtMs > 0) Some(distKm * 3600000.0 / dtMs.toDouble) else None
            out += SpeedRow(key, pingId, tsMs, Some(dtMs), Some(round6(distKm)),
              speed.map(round6), speed.map(_ > teleportKmh), is_late = false)
            lastPing.update((tsMs, latu, lonu))
          case None =>
            out += SpeedRow(key, pingId, tsMs, None, None, None, None,
              is_late = false)
            lastPing.update((tsMs, latu, lonu))
        }
      }
      out.result().iterator
    }
  }

  /** One [[SpeedRow]] per arriving ping (OutputMode.Append — each ping is
    * scored exactly once, against the latest accepted ping of its track).
    */
  def speedStream(pings: Dataset[Ping], teleportKmh: Double): Dataset[SpeedRow] = {
    implicit val outEnc: Encoder[SpeedRow] = Encoders.product[SpeedRow]
    import pings.sparkSession.implicits._
    pings.groupByKey(_._1)
      .transformWithState(new SpeedProcessor(teleportKmh),
        TimeMode.None(), OutputMode.Append())
  }
}
