package graft

/** [[SpillRehearsal]] — the memory-pressure gate: one representative of
  * every memory-sensitive shape (big sort-merge shuffles, the iterative
  * graph loop, a window-heavy battery, the multi-distinct Expand, and the
  * cold co-movement gold build) must complete under a starved memory
  * manager by spilling (never OOM), with results IDENTICAL to the
  * unconstrained run.
  * The constrained context needs its own JVM (memory manager and
  * force-spill thresholds are fixed at SparkContext creation, and the
  * shared suite session can't be stopped under parallel suites), so this
  * spec computes the expected digests in-process and spawns the rehearsal
  * as a subprocess with a tiny `spark.testing.memory`.
  */
class SpillRehearsalSpec extends SparkSpec {

  test("starved memory manager: shuffle/graph-loop/window/expand/gold-build matrix spills to completion, rows identical") {
    val sfDir = "/root/testdata/sf0.01"
    val expected = SpillRehearsal.Queries.map { q =>
      val rows = SparkEntry.queries(q)(spark, sfDir).collect()
      q -> ((rows.length, SpillRehearsal.digest(rows)))
    }.toMap
    expected.foreach { case (q, (n, _)) =>
      assert(n > 0, s"$q fixture must be non-trivial at sf0.01")
    }

    // modest heap on purpose: the STARVATION comes from
    // spark.testing.memory inside the rehearsal, the heap just has to
    // hold the JVM + collected results without masking an OOM as GC hell
    val (exit, lines) = RehearsalSpawn.run("graft.SpillRehearsal", "-Xmx2g", sfDir)
    val log = lines.mkString("\n")
    assert(exit === 0,
      s"rehearsal JVM must exit clean (spill, not OOM); tail:\n${lines.takeRight(40).mkString("\n")}")

    val line = "\"query\":\"([a-z_]+)\",\"rows\":(\\d+),\"digest\":\"([0-9a-f]+)\"".r
    val got = line.findAllMatchIn(log)
      .map(m => m.group(1) -> ((m.group(2).toInt, m.group(3)))).toMap
    assert(got.keySet === SpillRehearsal.Queries.toSet,
      s"every rehearsed query must report: $got")
    SpillRehearsal.Queries.foreach { q =>
      assert(got(q) === expected(q),
        s"$q under memory pressure must match the unconstrained run exactly")
    }
    val spilledBytes = "\"spilled_bytes\":(\\d+)".r
      .findFirstMatchIn(log).map(_.group(1).toLong)
    assert(spilledBytes.exists(_ > 0L),
      s"the rehearsal must actually exercise the spill path (got $spilledBytes) — " +
        "a zero means the starvation knobs rotted and the test is vacuous")
    val objAggFallbacks = "\"objagg_fallback_tasks\":(\\d+)".r
      .findFirstMatchIn(log).map(_.group(1).toLong)
    assert(objAggFallbacks.exists(_ > 0L),
      "the typed-Aggregator leg must actually hit ObjectHashAggregate's " +
        "sort-based fallback (serialized-buffer re-merge), or its digest " +
        s"equality proves nothing about that path (got $objAggFallbacks)")
  }

  test("starved memory manager: the five streaming standing-store merge paths spill to bit-identical store state") {
    // unconstrained baseline in the suite session — the SAME batch
    // sequence the subprocess drives (shared through runAll, so the two
    // sides cannot drift)
    val expected = StreamSpillRehearsal.runAll(spark)
      .map { case (op, n, d) => op -> ((n, d)) }.toMap
    expected.foreach { case (op, (n, _)) =>
      assert(n > 0, s"$op store must be non-trivial after the sequence")
    }

    val (exit, lines) = RehearsalSpawn.run("graft.StreamSpillRehearsal", "-Xmx2g")
    val log = lines.mkString("\n")
    assert(exit === 0,
      s"streaming rehearsal JVM must exit clean (spill, not OOM); tail:\n${lines.takeRight(40).mkString("\n")}")

    val line = "\"op\":\"([a-z_]+)\",\"store_rows\":(\\d+),\"digest\":\"([0-9a-f]+)\"".r
    val got = line.findAllMatchIn(log)
      .map(m => m.group(1) -> ((m.group(2).toLong, m.group(3)))).toMap
    assert(got.keySet === expected.keySet, s"every processor must report: $got")
    expected.foreach { case (op, (n, d)) =>
      assert(got(op) === ((n, d)),
        s"$op standing-store state under memory pressure must match the unconstrained run exactly")
    }
    val spilledBytes = "\"spilled_bytes\":(\\d+)".r
      .findFirstMatchIn(log).map(_.group(1).toLong)
    assert(spilledBytes.exists(_ > 0L),
      s"the streaming rehearsal must actually spill (got $spilledBytes)")
  }
}
