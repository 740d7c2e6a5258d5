package graft

import org.apache.spark.sql.functions._

import graft.ops.CoMovement

/** Scale rehearsal for the J1 dense-cell guard (`maxUidsPerCell`): the
  * declared tests pin the guard's SEMANTICS on toy frames; this spec makes
  * it ENGAGE under the skew it exists for — one anchorage cell holding
  * 2·10³ idle vessels, the exact shape `README.md:130` blames for busy-port
  * noise. The fixture is hourly-grain (pairsDaily's input contract): 66k
  * vessel-hours ≈ several-million-event equivalent, an order beyond the
  * sf0.1 testdata (100k raw events ⇒ ~3 orders fewer vessel-hours).
  *
  * What is asserted is DETERMINISTIC: the uncapped pair fanout is the
  * closed-form quadratic (hours × C(1000, 2) from the anchorage alone),
  * the capped run eliminates exactly the anchorage's contribution while
  * reproducing the background pair set row-for-row, and the capped fanout
  * respects the documented cells × C(cap, 2) bound. Wall times are
  * MEASURED and printed for SCALING.md's record, not asserted — a loaded
  * box must not flake the suite (the bench calibration discipline).
  */
class SkewRehearsalSpec extends SparkSpec {
  import spark.implicits._

  test("maxUidsPerCell engages on a 2000-vessel anchorage: quadratic fanout eliminated, background intact") {
    val hours = 6
    val anchorageUids = 2000L
    val bgUids = 10000L
    val bgPerCell = 4L // small genuine convoys, C(4,2)=6 pairs per cell-hour
    val d = to_date(lit("2025-06-01"))
    // anchorage: 2·10^3 vessels parked in ONE cell all day — no
    // co-movement signal, pure quadratic cost (C(2000,2) ≈ 2·10^6 pair
    // rows per hour)
    val anchorage = spark.range(anchorageUids * hours)
      .select((col("id") % anchorageUids).as("uid"), d.as("dt"),
        (col("id") / anchorageUids).cast("int").as("hr"),
        lit("ANCHORAGE").as("cell"))
    // background: 10^4 vessels in 4-vessel groups, each group drifting to a
    // fresh cell every hour (so pairs clear the gT>1 gate in the full op)
    val background = spark.range(bgUids * hours)
      .select((lit(100000) + col("id") % bgUids).as("uid"), d.as("dt"),
        (col("id") / bgUids).cast("int").as("hr"))
      .withColumn("cell", concat(lit("BG"),
        ((col("uid") - 100000) / bgPerCell).cast("long"), lit("_"), col("hr")))
    val hourly = anchorage.unionByName(background)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(hourly.count() === (anchorageUids + bgUids) * hours)

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val bgPairsPerHour = (bgUids / bgPerCell) * (bgPerCell * (bgPerCell - 1) / 2)
    val anchoragePairsPerHour = anchorageUids * (anchorageUids - 1) / 2

    // UNCAPPED: the anchorage emits C(1000,2) ≈ 5·10^5 pair rows PER HOUR
    val (uncapped, tUncapped) = timed {
      CoMovement.pairHours(hourly).count()
    }
    // the fanout's real cost lands DOWNSTREAM — every anchorage pair row
    // rides the pair-day shuffle and aggregation before the gT>1 gate can
    // discard it — so time the full operator both ways too
    val (_, tFullUncapped) = timed {
      CoMovement.pairsDaily(hourly, maxUidsPerCell = 0).count()
    }
    spark.catalog.clearCache() // pairsDaily persists its shared frame
    val (_, tFullCapped) = timed {
      CoMovement.pairsDaily(hourly, maxUidsPerCell = 500).count()
    }
    spark.catalog.clearCache()
    assert(uncapped === hours * (anchoragePairsPerHour + bgPairsPerHour),
      "closed-form fanout: the anchorage dominates quadratically")
    assert(uncapped > 10000000L, "the rehearsal must actually be nasty")

    // CAPPED at 500 (< 1000 anchorage occupants, > any background cell):
    // the anchorage bucket is excluded wholesale; background untouched
    val (capped, tCapped) = timed {
      CoMovement.pairHours(
        CoMovement.guardedHourly(hourly, maxUidsPerCell = 500)).count()
    }
    assert(capped === hours * bgPairsPerHour,
      "the cap must eliminate exactly the anchorage's contribution")
    // the documented bound: fanout <= occupied cells × C(cap, 2); here the
    // surviving cells hold only bgPerCell vessels, so the real fanout sits
    // far under it
    val occupiedCells = (bgUids / bgPerCell) * hours
    assert(capped <= occupiedCells * (500L * 499L / 2),
      "capped fanout respects the cells × C(cap,2) ceiling")

    // end-to-end pairsDaily consistency: the capped full operator's output
    // equals the background-only corpus's — drop semantics leave every
    // surviving coefficient identical to a world where the anchorage never
    // existed
    val cappedDaily = CoMovement.pairsDaily(hourly, maxUidsPerCell = 500)
      .select("uid_a", "uid_b", "day_date", "hT", "gT", "gto")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bgOnlyDaily = CoMovement.pairsDaily(background, maxUidsPerCell = 0)
      .select("uid_a", "uid_b", "day_date", "hT", "gT", "gto")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(cappedDaily.length === bgOnlyDaily.length &&
      cappedDaily.zip(bgOnlyDaily).forall { case (a, b) => a == b },
      "capped run == anchorage-free world, coefficient for coefficient")

    info(f"uncapped pairHours: $uncapped rows in $tUncapped%.1f s; " +
      f"capped: $capped rows in $tCapped%.1f s " +
      f"(${uncapped.toDouble / capped}%.0fx fanout eliminated)")
    println(f"[skew-rehearsal] fanout uncapped=$uncapped ($tUncapped%.1fs) " +
      f"capped=$capped ($tCapped%.1fs); full pairsDaily " +
      f"uncapped=$tFullUncapped%.1fs capped=$tFullCapped%.1fs")
    hourly.unpersist(blocking = false)
    spark.catalog.clearCache()
  }
}
