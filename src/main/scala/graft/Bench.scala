package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every declared query at `SPARK_GRAFT_SF_DIR`.
  *
  * Protocol: warm the session (parquet footers, codegen compiler), force the
  * shared gold-stage build (timed separately as `gold_build_sec` — the
  * refresh-once cost every later query amortizes, mirroring the reference's
  * gold refresh), then run each query `SPARK_GRAFT_BENCH_REPS` times (default
  * 3) REP-MAJOR — rep round 1 of every query, then round 2, then round 3 —
  * and report the per-query minimum. Query-major rep loops let one
  * sustained contention pulse cover ALL reps of the queries it lands on
  * (BENCH_r10 recorded 113 s where the quiet truth was 71 s); rep-major
  * spreads each query's reps across the suite's whole wall clock so a
  * pulse taints at most one rep and the min recovers the quiet number.
  * The machine shows ±8 s/query
  * background variance, so single-shot numbers aren't trustworthy. A query
  * that throws is reported as value -1 plus an `"errors"` entry; it can never
  * record a plausible-looking wall time.
  *
  * Contention detection: a recorded round once tripled on untouched code
  * because the box was loaded, and nothing in the artifact distinguished
  * noise from regression. Three probes make that diagnosable from the JSON
  * alone: (1) a FIXED calibration query (`q1_agg`, warmed once untimed,
  * Watchdog-guarded like any real query) is timed before the suite, after
  * it, and every ~N/5 queries in between (`calib_series` — contention
  * arrives in pulses the endpoints alone miss); a recorded SETTLE probe
  * (`calib_settle_sec`) absorbs the gold build's GC/page-cache wake
  * first, and the interior series is START-BRACKETED — its first probe
  * fires before the first timed query; (2) `calib_spread` = the largest
  * RISE of any probe over the running minimum of earlier probes in the
  * interior series + post (`spread_rule` "rise-over-running-min/v5" —
  * stamped in the artifact so cross-round tooling never silently
  * compares across a rule change), the one-number verdict (~1 quiet,
  * ≫1 loaded), surfaced as `"tainted": true` whenever it exceeds 2 —
  * v6 adds a HEAVY probe series (a ~1 s multi-stage shuffle query at
  * half the light cadence, own rise spread, either taints) because a
  * cached single-stage floor is blind to sustained whole-run
  * contention that slows only parallel shuffle work, and a same-HEAD
  * `drift_vs_record`/`suspect_vs_record` stamp against the committed
  * BENCH_full.json (> 1.25× on the intersection ⇒ rerun before use);
  * Rises, not max/min: quiet runs produce monotone warm decay (never
  * rises ⇒ can never flag, whatever its amplitude — at small scale it
  * exceeds 2× and mis-flagged quiet runs under every max/min variant)
  * while contention must LIFT a probe above a floor already witnessed,
  * spike or sustained alike (10-run round-17 calibration: contended
  * 2.11-5.12, quiet 1.27-1.71); (3) every query's full rep
  * vector, min, and median land in `BENCH_full.json` next to the repo (the
  * 2000-char driver tail keeps only the slowest queries, which is exactly
  * where a fast query's 10× relative regression hides). A min ≪ median
  * within one query is itself a contention signature.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** The v5 contention verdict (see the rule comment in [[main]]): the
    * largest rise of any sample over the running minimum of all EARLIER
    * samples. Monotone decay yields 1.0 by construction; a spike or a
    * sustained pulse must lift some sample above an already-witnessed
    * floor. Unit-pinned in BenchSpec against the round-17 10-run
    * calibration dataset (contended runs 2.11–5.12, quiet 1.27–1.71).
    */
  /** COVERAGE.md bench-record rule, made STRUCTURAL (r19 verdict #2):
    * BENCH_full.json is the committed full-suite RECORD that the drift
    * stamp and the judge's gate anchor on, and twice (r17, r18) a
    * slower driver post-snapshot run silently displaced it in the
    * working tree. Given the committed record's (value, tainted, sf)
    * from `git show HEAD:BENCH_full.json` and the current run's total /
    * taint / sf, return the artifact path to write and an adjudication
    * line. A tainted, slower, or different-sf full run lands in
    * BENCH_last.json; only an equal-or-faster untainted same-sf run
    * displaces the record. Unit-pinned in BenchRecordRuleSpec.
    */
  private[graft] def recordWritePath(
      committed: Option[(Double, Boolean, String)], sfDir: String,
      curTotal: Double, curTainted: Boolean): (String, String) =
    committed match {
      case Some((recVal, false, recSf)) if recSf == sfDir && recVal > 0 =>
        if (curTainted)
          ("BENCH_last.json",
           f"record rule: current run is tainted; committed untainted " +
             f"record $recVal%.3f s stands -> BENCH_last.json")
        else if (curTotal > recVal)
          ("BENCH_last.json",
           f"record rule: current $curTotal%.3f s is slower than the " +
             f"committed untainted record $recVal%.3f s -> BENCH_last.json")
        else
          ("BENCH_full.json",
           f"record rule: new record $curTotal%.3f s displaces " +
             f"$recVal%.3f s")
      case Some((_, false, recSf)) if recSf != sfDir =>
        ("BENCH_last.json",
         s"record rule: committed record is at sf=$recSf, this run is " +
           s"at sf=$sfDir -> BENCH_last.json")
      case _ => ("BENCH_full.json", "")
    }

  private[graft] def riseSpread(samples: Seq[Double]): Double = {
    var runMin = Double.MaxValue
    var worst = 1.0
    samples.filter(_ > 0).foreach { v =>
      if (runMin != Double.MaxValue && v / runMin > worst) worst = v / runMin
      if (v < runMin) runMin = v
    }
    worst
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // lets Tables.events read legacy TIMESTAMP(NANOS) testdata as raw
      // longs; harmless when the files carry MICROS (round 7+)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // rep-major interleaving runs 155 queries × several codegen stages
      // between two reps of the SAME query; the default 100-entry compiled-
      // class cache evicts everything in between, so every rep pays Janino
      // recompilation (+~40% uniform on quiet minima, measured round 11).
      // A session serving a 155-query workload would size this cache the
      // same way — this is engine configuration, not benchmark warming.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.Map.empty[String, String]
    def guard(label: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        errors(label) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
    // warm the session once (codegen compiler, parquet footers, scheduler) so
    // the first timed query isn't charged JVM startup. Guarded: a broken
    // loader must cost only an "errors" entry, never the whole round's JSON
    // line (round 7 lost its bench to an unguarded warm-up).
    guard("warmup_events") { engine.Tables.events(spark, sfDir).count() }
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      guard(s"warmup_$t") { engine.Tables.load(spark, sfDir, t).count() }
    }
    val g0 = System.nanoTime()
    guard("warm_gold") { SparkEntry.warmGold(spark, sfDir) }
    val goldSec = (System.nanoTime() - g0) / 1e9
    spark.catalog.clearCache()

    // fixed calibration probe: q1_agg, warmed once untimed so pre and post
    // measure the same already-codegen'd plan under the machine's CURRENT
    // load — the pre/post pair brackets the suite
    // the probe gets the SAME hang protection as real queries: a stalled
    // probe (the very contention it measures, taken to the extreme) must
    // cost one error entry, not the round's JSON line
    // each probe failure gets its OWN error key (calibration_0, _1, ...):
    // the series can hold several -1.0 samples and the artifact must say
    // which probe produced which failure, not just the last one
    var calibSeq = 0
    def probe(queryName: String, prefix: String): Double = {
      val key = s"${prefix}_$calibSeq"; calibSeq += 1
      try {
        val fn = SparkEntry.queries(queryName)
        val t0 = System.nanoTime()
        val res = engine.Watchdog.run(spark, key,
          sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "900").toLong) {
          fn(spark, sfDir).count()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        engine.CacheScope.releaseAll()
        res match {
          case Right(_) => sec
          case Left(reason) => errors(key) = reason; -1.0
        }
      } catch { case e: Throwable =>
        errors(key) =
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        -1.0
      }
    }
    def calibrate(): Double = probe("q1_agg", "calibration")
    // HEAVY calibration probe (v6, closing the r17 sustained-contention
    // blind spot): q1_agg's ~0.2 s cached floor stayed quiet (0.218)
    // through a round-final run whose 32-way-parallel suite read 30%
    // slow — sustained whole-run contention moves the resource the SUITE
    // contends on (shuffle + multi-stage CPU), which a single-stage
    // cached scan barely touches. pmi_bigrams (~1 s quiet at sf0.1,
    // explode + two shuffled aggregations over documents) is sized to
    // feel that load; its own rise-over-running-min spread taints the
    // run exactly like the light probe's. Cadence: every SECOND light
    // probe point (+ warm/settle/post), ~8 × 1 s per full run — the
    // round-17 blind spot mislabeled a 97.5 s artifact against a 73.9 s
    // same-HEAD record, so the ~10 s instrument cost buys back trust in
    // every total.
    val HeavyProbeQuery = "pmi_bigrams"
    def calibrateHeavy(): Double = probe(HeavyProbeQuery, "calibration_heavy")
    guard("calibration_warm") {
      SparkEntry.queries("q1_agg")(spark, sfDir).count(); spark.catalog.clearCache()
    }
    guard("calibration_heavy_warm") {
      SparkEntry.queries(HeavyProbeQuery)(spark, sfDir).count()
      spark.catalog.clearCache(); engine.CacheScope.releaseAll()
    }
    // SETTLE probe (recorded, excluded from the spread): the first timed
    // probe after warm_gold systematically reads 1.5-3× the suite-interior
    // floor even on a QUIET box — four quiet round-16 legs measured pre
    // 0.26/0.30/0.52/0.26 s against interior floors of 0.15-0.20 s with
    // every interior probe and the post in-band; the sf1e leg's 0.52 s
    // single-handedly pushed spread to 2.79 and self-flagged a quiet run.
    // That is the gold build's GC/page-cache wake, not host contention —
    // the thing the spread exists to measure. One probe absorbs the wake;
    // calibPre then brackets the suite from a settled JVM. The settle
    // value rides in the artifact so nothing is hidden.
    val calibSettle = calibrate()
    val calibPre = calibrate()
    val heavySettle = calibrateHeavy()
    val heavyPre = calibrateHeavy()
    // mid-suite probes: host contention arrives in PULSES (a query can read
    // 3× slow while pre/post calibration both look normal) — re-time the
    // fixed probe every `calibEvery` queries so the artifact carries a
    // contention time SERIES, not just endpoints
    val calibSeries = scala.collection.mutable.ArrayBuffer.empty[Double]
    val heavySeries = scala.collection.mutable.ArrayBuffer.empty[Double]

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 runs just those queries — the targeted
    // profiling loop; the driver never sets it, so round numbers are whole
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // hang protection mirrors Verify's: a query that stalls is cancelled and
    // recorded as an error instead of eating the round's wall clock
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "900").toLong
    val calibEvery = math.max(1, selected.size / 5) // ~4 interior probes per rep round
    // start at the threshold so the FIRST interior probe fires immediately
    // before the first timed query — the series then brackets the suite
    // START (the start-bracketed series the v5 rise-over-running-min rule
    // walks; see the verdict comment)
    var sinceCalib = calibEvery
    // REP-MAJOR interleaving: run rep round 1 of ALL queries, then round 2,
    // then round 3 — not 3 back-to-back reps per query. A sustained host
    // contention pulse (minutes long) used to cover every rep of the queries
    // it landed on, inflating their MINIMA with nothing in the artifact able
    // to say so (BENCH_r10: recorded 113 s, quiet truth 71 s). Spreading a
    // query's reps across the whole suite's wall clock means one pulse can
    // taint at most one rep of any query; the min recovers the quiet number.
    val order = selected.toSeq
    val times = scala.collection.mutable.LinkedHashMap(
      order.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    // a TIMED-OUT query skips its remaining rep rounds — a hang won't
    // resolve between reps, and retrying would cost reps × timeoutSec of
    // wall clock; a thrown exception still retries (flakes fail fast+cheap)
    val hung = scala.collection.mutable.Set.empty[String]
    var rep = 0
    while (rep < reps) {
      order.foreach { case (name, fn) =>
        if (!hung(name)) {
          sinceCalib += 1
          if (sinceCalib >= calibEvery && selected.size > 5) {
            sinceCalib = 0
            calibSeries += calibrate()
            // heavy probe every SECOND light point: the suite-shaped
            // load sensor, at half the cadence to bound instrument cost
            if (calibSeries.size % 2 == 1) heavySeries += calibrateHeavy()
          }
          val t0 = System.nanoTime()
          try {
            engine.Watchdog.run(spark, name, timeoutSec) { fn(spark, sfDir).count() } match {
              case Right(_) => times(name) += (System.nanoTime() - t0) / 1e9
              case Left(reason) => errors(name) = reason; hung += name
            }
          }
          catch { case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          }
          spark.catalog.clearCache() // operators may persist shared frames
          engine.CacheScope.releaseAll() // and the retained plan handles
        }
      }
      rep += 1
    }
    val results = times.map { case (n, ts) => n -> ts.toSeq }
    val calibPost = calibrate()
    val heavyPost = calibrateHeavy()
    // one-number contention verdict: the largest RISE of any probe over
    // the running minimum of all EARLIER probes, walked over the
    // start-bracketed interior series + post (`spread_rule`
    // "rise-over-running-min/v5"). WHY rises and not max/min: the two
    // structural shapes a quiet run produces are (a) monotone JVM
    // warm-DECAY — the series only falls, so it produces NO rise and can
    // never flag, however large its start-to-floor amplitude — and (b) a
    // flat floor with ±15% wobble, rise ≈ 1. Host contention, by
    // contrast, must LIFT some probe above a floor already witnessed —
    // a spike or a sustained pulse both register (round 9's sustained
    // mid-suite pulse reads 5.1 under this rule on the round-17 replay).
    // Round-17 calibration dataset (10 runs, one noisy afternoon): the
    // four genuinely contended runs (totals +19%..+86%) score
    // 2.11/2.11/2.18/5.12; the five quiet runs score 1.27-1.71; the v3
    // and v4 max/min rules both mis-flagged QUIET sf0.01 runs on the
    // decay envelope (pre 1.9×, start-bracket probe 2.19× the floor —
    // at a 0.13 s probe floor the decay amplitude simply exceeds 2×).
    // Known blind spot, accepted: contention present from the very first
    // sample onward that then FADES looks like decay (no earlier floor
    // to rise above). Rep-major interleaving bounds the damage — a
    // start-straddling pulse inflates only rep 1 of early queries and
    // the per-query min recovers — and the same ambiguity was v2's, at
    // "low" advisory severity.
    // Rule history (the `spread_rule` field exists so cross-round tooling
    // never silently compares across a boundary):
    //   v1 (≤ r15): max/min over pre+interior+post, no settle probe;
    //   v2 (r16):   max/min over interior+post, settle recorded;
    //   v3/v4 (r17, experiments): pre re-included post-settle, then
    //        start-bracketed max/min — both re-flagged quiet small-scale
    //        runs on warm decay (measured, see SCALING.md);
    //   v5 (r17+):  rise-over-running-min on the start-bracketed series;
    //   v6 (r18+):  v5 PLUS a heavy probe series (pmi_bigrams, every 2nd
    //        light point) with its own rise spread — round 17 produced a
    //        97.5 s "untainted" run against a 73.9 s same-HEAD record:
    //        SUSTAINED whole-run contention slowed the 32-way-parallel
    //        suite ~30% while the light probe's cached single-stage floor
    //        (0.218 s) never moved; a suite-shaped probe feels that load.
    //        Either spread > 2 taints. v6 also stamps drift vs the
    //        committed BENCH_full.json record (same sf, untainted) —
    //        `suspect_vs_record` > 1.25× means rerun before treating the
    //        totals as regression evidence even if both spreads look
    //        quiet (contention present from the first sample onward that
    //        never fades is invisible to ANY rise rule; the record is).
    // Targeted SPARK_GRAFT_BENCH_ONLY runs of ≤5 queries suppress the
    // interior probes; pre→post is the fallback pair there (a rise from
    // the settled pre to post is the same contention signal).
    val calibAll = ((if (calibSeries.isEmpty) Seq(calibPre)
                     else calibSeries.toSeq) :+ calibPost).filter(_ > 0)
    val calibSpread = riseSpread(calibAll)
    // same walk discipline as the light series: pre is recorded but
    // EXCLUDED when an interior series exists (the start-bracketed first
    // interior sample covers the suite start; a lucky low pre draw must
    // not become the running min the interior wobble rises against)
    val heavyAll = ((if (heavySeries.isEmpty) Seq(heavyPre)
                     else heavySeries.toSeq) :+ heavyPost).filter(_ > 0)
    val heavySpread = riseSpread(heavyAll)
    val spreadRule =
      if (calibSeries.isEmpty) "rise-pre-post/v6-heavy-targeted"
      else "rise-over-running-min/v6-heavy"
    // self-labeling artifact: spread > 2 means the SAME warmed plan varied
    // 2×+ across the suite — the box was loaded and the totals can't be
    // trusted as regression evidence. The flag lives IN the JSON so a later
    // reader doesn't have to re-derive the verdict from the series.
    val tainted = calibSpread > 2.0 || heavySpread > 2.0
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    def num(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString(""","errors":{""", ",", "}")
    val mins = results.map { case (n, ts) => n -> (if (ts.nonEmpty) ts.min else -1.0) }
    val total = mins.values.filter(_ >= 0).sum
    // v6 same-HEAD drift stamp (COVERAGE.md record rule, made automatic):
    // compare this run's per-query minima against the COMMITTED
    // BENCH_full.json (`git show HEAD:...`), set-aware over the query-name
    // intersection, only when the record is untainted and at the same sf.
    // A full-run total > 1.25× the committed record is `suspect_vs_record`
    // — rerun before treating it as regression evidence, even if both
    // probe spreads read quiet (round 17: a 97.5 s run self-labeled
    // untainted against a 73.9 s same-HEAD record). Targeted runs skip
    // the stamp; any git/parse failure just omits the fields.
    // parse HEAD's committed BENCH_full.json ONCE; feeds both the drift
    // stamp and the r19 record-write guard below
    val committedFull: Option[com.fasterxml.jackson.databind.JsonNode] =
      if (only.nonEmpty) None
      else try {
        import scala.sys.process._
        val buf = new StringBuilder
        val rc = Seq("git", "show", "HEAD:BENCH_full.json")
          .!(ProcessLogger(l => { buf.append(l).append('\n'); () }, _ => ()))
        if (rc != 0) None
        else Some(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(buf.toString))
      } catch { case _: Throwable => None }
    val drift: Option[(Int, Double, Double)] =
      committedFull.flatMap { root =>
        try {
          if (root.path("tainted").asBoolean(true) ||
              root.path("sf").asText("") != sfDir) None
          else {
            val rq = scala.collection.mutable.Map.empty[String, Double]
            val it = root.path("queries").fields()
            while (it.hasNext) {
              val e = it.next()
              val m = e.getValue.path("min").asDouble(-1.0)
              if (m >= 0) rq(e.getKey) = m
            }
            val common = rq.keySet.toSet
              .intersect(mins.filter(_._2 >= 0).keySet.toSet)
            if (common.size < math.max(5, mins.size / 2)) None
            else {
              val rec = common.toSeq.map(rq).sum
              val cur = common.toSeq.map(mins).sum
              if (rec <= 0) None else Some((common.size, rec, cur))
            }
          }
        } catch { case _: Throwable => None }
      }
    val driftJson = drift match {
      case Some((n, rec, cur)) =>
        s""","drift_common":$n,"record_total_common":${num(rec)},"current_total_common":${num(cur)},"drift_vs_record":${num(cur / rec)},"suspect_vs_record":${cur / rec > 1.25}"""
      case None => ""
    }
    val heavyJson = {
      val hs = heavySeries.map(num).mkString("[", ",", "]")
      s""","heavy_probe":${jstr(HeavyProbeQuery)},"calib_heavy_settle_sec":${num(heavySettle)},"calib_heavy_pre_sec":${num(heavyPre)},"calib_heavy_post_sec":${num(heavyPost)},"calib_heavy_series":$hs,"calib_heavy_spread":${num(heavySpread)}"""
    }
    // the full per-query record — every query, min AND median AND the raw
    // rep vector — goes to BENCH_full.json next to the repo, immune to the
    // driver's 2000-char tail budget; the printed line stays the driver's
    val fullJson = {
      val qs = results.toSeq.sortBy { case (n, ts) => -(if (ts.nonEmpty) ts.min else -1.0) }
        .map { case (n, ts) =>
          val minV = if (ts.nonEmpty) ts.min else -1.0
          s"${jstr(n)}:{\"min\":${num(minV)},\"median\":${num(median(ts))}," +
            s"\"reps\":[${ts.map(num).mkString(",")}]}"
        }.mkString("{", ",", "}")
      val series = calibSeries.map(num).mkString("[", ",", "]")
      s"""{"metric":"total","value":${num(total)},"unit":"sec","gold_build_sec":${num(goldSec)},"calib_settle_sec":${num(calibSettle)},"calib_pre_sec":${num(calibPre)},"calib_post_sec":${num(calibPost)},"calib_series":$series,"calib_spread":${num(calibSpread)}$heavyJson$driftJson,"spread_rule":"$spreadRule","tainted":$tainted,"reps":$reps$errJson,"sf":"$sfDir","queries":$qs}"""
    }
    // targeted (SPARK_GRAFT_BENCH_ONLY) runs write BENCH_targeted.json:
    // BENCH_full.json is the committed full-suite RECORD the drift stamp
    // and the COVERAGE.md record rule anchor on, and a probe run in the
    // repo cwd used to silently displace it (it happened twice in round
    // 18 alone before this guard). r19: full runs additionally pass the
    // record-write guard — a tainted/slower/different-sf run lands in
    // BENCH_last.json so the committed record can never be clobbered.
    val (fullPath, adjudication) =
      if (only.nonEmpty) ("BENCH_targeted.json", "")
      else recordWritePath(
        committedFull.map(r => (r.path("value").asDouble(-1.0),
          r.path("tainted").asBoolean(true), r.path("sf").asText(""))),
        sfDir, total, tainted)
    if (adjudication.nonEmpty) System.err.println(s"[bench] $adjudication")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(fullPath),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $fullPath: $e") }
    // The driver captures only the last ~2000 chars of output and parses the
    // JSON line out of that window; round 5's full per-query map outgrew it
    // and the round lost its headline number. Emit the line at a budget: all
    // queries if they fit, else the slowest N (the interesting ones) with an
    // explicit omitted count. `total` always covers every query.
    def line(qMap: Seq[(String, Double)], omitted: Int): String = {
      val qs = qMap.map { case (k, v) => s"${jstr(k)}:${num(v)}" }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      val series = calibSeries.map(num).mkString("[", ",", "]")
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs$om,"gold_build_sec":${num(goldSec)},"calib_settle_sec":${num(calibSettle)},"calib_pre_sec":${num(calibPre)},"calib_post_sec":${num(calibPost)},"calib_series":$series,"calib_spread":${num(calibSpread)}$heavyJson$driftJson,"spread_rule":"$spreadRule","tainted":$tainted,"full":"$fullPath","reps":$reps$errJson,"sf":"$sfDir"}"""
    }
    val bySlowest = mins.toSeq.sortBy(-_._2)
    val budget = 1750 // leaves headroom for sbt's [success] trailer in the 2000-char tail
    var keep = bySlowest.length
    while (keep > 1 && line(bySlowest.take(keep), bySlowest.length - keep).length > budget)
      keep -= 1
    println(line(bySlowest.take(keep), bySlowest.length - keep))
    spark.stop()
  }
}
