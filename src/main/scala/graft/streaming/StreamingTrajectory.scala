package graft.streaming

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
  * distance math — exact BIGINT squared distance, floor-corrected integer
  * sqrt, exact integer micro-deg/hour speed, and one closing multiply by
  * [[graft.ops.Trajectory.KmPerMicroDeg]] per output (no `round()`, no
  * multi-step float chain) — so on in-order input the emitted rows are
  * bit-identical to the batch operator's (asserted in `StreamingSpec`). Divergence is confined to out-of-order arrivals: a ping
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
            // the batch twin's exact-integer kinematics, in plain Scala:
            // floor-corrected integer sqrt, Long division for the exact
            // micro-deg/hour speed, one closing multiply per output
            val d2 = dlat * dlat + dlon * dlon
            val s0 = math.floor(math.sqrt(d2.toDouble)).toLong
            val s1 = s0 - (if (s0 * s0 > d2) 1L else 0L)
            val distU = s1 + (if ((s1 + 1L) * (s1 + 1L) <= d2) 1L else 0L)
            val distKm = distU.toDouble * graft.ops.Trajectory.KmPerMicroDeg
            val dtMs = tsMs - pTs
            val speed =
              if (dtMs > 0)
                Some((distU * 3600000L / dtMs).toDouble *
                  graft.ops.Trajectory.KmPerMicroDeg)
              else None
            out += SpeedRow(key, pingId, tsMs, Some(dtMs), Some(distKm),
              speed, speed.map(_ > teleportKmh), is_late = false)
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
