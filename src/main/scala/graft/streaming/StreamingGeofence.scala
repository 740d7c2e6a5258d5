package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online geofence transition detection — the streaming twin of
  * [[graft.ops.Tracks.geofenceHits]]: instead of tagging positions after
  * the fact, emit an event the moment a vessel ENTERS, EXITS, or SWITCHES
  * zones. The alerting read of the same config-scale bounding boxes
  * (half-open [min, max) on both axes). Batch/stream equivalence is
  * scoped to DISJOINT zone configs (which half-open bounds give any
  * edge-to-edge tiling): there a position has at most one containing zone
  * and the two operators agree on every tag. Under deliberately
  * OVERLAPPING zones they diverge by design — the batch join tags a
  * position once per containing zone (all memberships), while this
  * tracker needs the single current zone per vessel and resolves overlap
  * to the first-declared ([[zoneOf]]); a transition stream over
  * multi-membership is not well-defined without a policy, and
  * first-declared is the deterministic one chosen here.
  *
  * State per vessel is ONE (zone, ts) pair — constant, no history — so
  * state-store size is O(active vessels) regardless of stream length; keys
  * shard by uid hash like every other per-vessel processor here.
  *
  * Ordering contract: rows within a micro-batch sort by (event time, lat,
  * lon) before folding — the position components break ties among
  * same-timestamp pings, so the fold order (and thus the emitted
  * transition sequence and final state) is a pure function of the batch's
  * row SET, stable across task retries, where a bare event-time sort
  * would leave same-ts pings in arrival order and a retried micro-batch
  * could emit a different sequence; a cross-batch ping AT OR BEFORE the
  * state's timestamp is dropped, never applied — state must not regress
  * and an at-least-once
  * redelivery must be a no-op (see the inline note in [[update]] for why
  * equal timestamps cannot be accepted without breaking replay
  * idempotence), the same monotonicity discipline as
  * [[StreamingTrajectory]]. A vessel's first ever ping emits `enter` only
  * if it is inside a zone (the unknown prior is treated as outside).
  */
object StreamingGeofence {

  case class Ping(uid: Long, ts: Timestamp, lat: Double, lon: Double)
  /** `zone` is "" while the vessel is outside every fence. */
  case class ZoneState(zone: String, tsMs: Long)
  case class Transition(uid: Long, ts: Timestamp, from_zone: String,
                        to_zone: String, kind: String)

  /** First containing zone in declaration order (zones normally disjoint;
    * overlap resolves deterministically to the earliest declared).
    */
  def zoneOf(zones: Seq[(String, Double, Double, Double, Double)],
             lat: Double, lon: Double): String =
    zones.collectFirst {
      case (name, la0, la1, lo0, lo1)
        if lat >= la0 && lat < la1 && lon >= lo0 && lon < lo1 => name
    }.getOrElse("")

  private def kindOf(from: String, to: String): String =
    if (from.isEmpty) "enter" else if (to.isEmpty) "exit" else "switch"

  /** Per-vessel fold: compare each in-order ping's zone to the running
    * one, emit a [[Transition]] on every change, keep only the latest
    * (zone, ts) in state.
    */
  def update(zones: Seq[(String, Double, Double, Double, Double)])(
      uid: Long, rows: Iterator[Ping],
      state: GroupState[ZoneState]): Iterator[Transition] = {
    val prev = state.getOption.getOrElse(ZoneState("", Long.MinValue))
    // drop pings at or before the state's timestamp. Accepting EQUAL
    // timestamps was tried and reverted: with only (zone, ts) in state, a
    // redelivered old ping at the state's exact ts is indistinguishable
    // from a genuine second same-ts reading, so an at-least-once replay
    // whose zone differs would emit a spurious transition and ping-pong
    // state on every redelivery. Idempotence and monotonicity win; the
    // cost is that a cross-batch same-timestamp reading is dropped
    // (in-batch same-ts pings all apply — the filter only guards against
    // HISTORY). Feed sub-second event times if same-ts readings matter.
    // deterministic total order: (ts, lat, lon) — see the ordering
    // contract in the object doc for why same-ts ties must not fall back
    // to arrival order
    val inOrder = rows.toList.sortBy(p => (p.ts.getTime, p.lat, p.lon))
      .filter(_.ts.getTime > prev.tsMs)
    val (last, out) = inOrder.foldLeft((prev, List.empty[Transition])) {
      case ((cur, acc), p) =>
        val z = zoneOf(zones, p.lat, p.lon)
        val next = ZoneState(z, p.ts.getTime)
        if (z == cur.zone) (next, acc)
        else (next, Transition(uid, p.ts, cur.zone, z, kindOf(cur.zone, z)) :: acc)
    }
    if (last.tsMs != Long.MinValue) state.update(last)
    out.reverse.iterator
  }

  /** Wire the transition detector over a streaming Dataset[Ping]. */
  def transitions(pings: Dataset[Ping],
                  zones: Seq[(String, Double, Double, Double, Double)]): Dataset[Transition] = {
    val spark = pings.sparkSession
    import spark.implicits._
    pings.groupByKey(_.uid)
      .flatMapGroupsWithState[ZoneState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(zones))
  }
}
