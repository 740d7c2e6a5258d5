package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based trip segmentation with custom state — the streaming-native form
  * of the track explorer's trip assembly (`apps/track_explorer.py:65-84`,
  * which sorts per-track points and packs them into path arrays app-side).
  *
  * A "trip" is a maximal run of points per vessel with no gap larger than
  * `gapMinutes`. Batch-side this is a window `lag`-and-cumsum; stream-side it
  * is `flatMapGroupsWithState`: state = the open trip per vessel, emitted
  * when a gap (or processing-time timeout) closes it.
  *
  * Scale: state per key is one open trip, hard-capped at `maxOpenPoints`
  * (a never-silent vessel force-flushes full segments instead of growing
  * without bound); keys shard across executors by uid hash — the same key
  * the silver layer buckets on, so a co-partitioned source avoids a shuffle.
  */
object SessionTracks {

  case class Point(uid: Long, ts: Timestamp, pos: Double)
  case class TripState(points: List[Point])
  case class Trip(uid: Long, startTs: Timestamp, endTs: Timestamp,
                  nPoints: Int, positions: Seq[Double])

  private def toTrip(pts: List[Point]): Trip = {
    val sorted = pts.sortBy(_.ts.getTime)
    Trip(sorted.head.uid, sorted.head.ts, sorted.last.ts, sorted.length,
      sorted.map(_.pos))
  }

  /** Close out trips for one vessel given new points. Emits every trip whose
    * end is followed by a gap > gapMinutes; keeps the open tail in state.
    * `armTimeout` additionally schedules a processing-time flush of the open
    * trip (only legal when the query runs with ProcessingTimeTimeout).
    *
    * `maxOpenPoints` bounds per-key state: a vessel that never pauses longer
    * than the gap would otherwise accumulate its whole history in state. When
    * the open run reaches the cap it is force-flushed in `maxOpenPoints`-sized
    * segments (the split is artificial, like any sessionizer's max-length
    * cut); only the sub-cap tail stays in state.
    */
  def updateTrips(gapMinutes: Long, armTimeout: Boolean,
                  maxOpenPoints: Int = 10000)(
      uid: Long, rows: Iterator[Point], state: GroupState[TripState]): Iterator[Trip] = {
    require(maxOpenPoints > 0, "maxOpenPoints must be positive")
    val gapMs = gapMinutes * 60000L
    if (state.hasTimedOut) {
      val out = state.getOption.map(s => toTrip(s.points)).iterator
      state.remove()
      return out
    }
    val incoming = rows.toList
    val all = (state.getOption.map(_.points).getOrElse(Nil) ++ incoming)
      .sortBy(_.ts.getTime)
    // split on gaps
    val (closed, open) = all.foldLeft((List.empty[List[Point]], List.empty[Point])) {
      case ((done, cur), p) =>
        cur match {
          case Nil => (done, List(p))
          case last :: _ if p.ts.getTime - last.ts.getTime <= gapMs =>
            (done, p :: cur)
          case _ => (done :+ cur.reverse, List(p))
        }
    }
    // force-flush full segments of an over-long open run; keep only the tail
    val openOrdered = open.reverse
    val (forced, tail) =
      if (openOrdered.length < maxOpenPoints) (Nil, openOrdered)
      else {
        val groups = openOrdered.grouped(maxOpenPoints).toList
        if (groups.last.length == maxOpenPoints) (groups, Nil)
        else (groups.init, groups.last)
      }
    if (tail.nonEmpty) {
      state.update(TripState(tail))
      if (armTimeout) state.setTimeoutDuration(s"$gapMinutes minutes")
    } else state.remove()
    (closed ++ forced).map(toTrip).iterator
  }

  /** Wire the stateful trip splitter over a streaming Dataset[Point].
    *
    * `flushSilentVessels=true` arms a processing-time timeout that emits the
    * open trip when a vessel goes silent for `gapMinutes` of wall-clock time.
    * NOTE: processing-time timeouts make Spark run continuous no-data
    * micro-batches (timers must fire with no input), so
    * `processAllAvailable()` never settles — use only on genuinely unbounded
    * production streams, never in tests or AvailableNow backfills.
    */
  def trips(points: Dataset[Point], gapMinutes: Long = 60,
            flushSilentVessels: Boolean = false,
            maxOpenPoints: Int = 10000): Dataset[Trip] = {
    val spark = points.sparkSession
    import spark.implicits._
    val timeout =
      if (flushSilentVessels) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.uid)
      .flatMapGroupsWithState[TripState, Trip](OutputMode.Append(), timeout)(
        updateTrips(gapMinutes, flushSilentVessels, maxOpenPoints))
  }
}
