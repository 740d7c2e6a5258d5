package graft

/** [[RetryRehearsal]] — the failure-injection gate: every gold build and
  * every query whose retry-determinism rests on a documented protocol
  * (PlanSpec's whitelist) must produce BIT-IDENTICAL results when first
  * task attempts are killed and failed, with the retries actually observed
  * (injected-fault and successful-retry counts asserted positive — a
  * rehearsal where nothing was killed proves nothing).
  *
  * The faulted context needs its own JVM: the fault-injecting `file:`
  * scheme and local-mode maxFailures are fixed at SparkContext creation,
  * and killing first attempts inside the shared parallel-suite session
  * would fault every OTHER suite's jobs too.
  */
class RetryRehearsalSpec extends SparkSpec {

  test("killed and failed first attempts: gold builds + protocol queries retry to bit-identical results") {
    val sfDir = "/root/testdata/sf0.01"
    // expected digests from THIS (unfaulted) session — gold builds are
    // un-materialized plans, queries read the suite GoldCache; cross-JVM
    // digest equality IS the retry-determinism claim
    val expected: Map[String, (Int, String)] =
      (SparkEntry.goldBuilds(spark, sfDir).toSeq.map {
        case (n, df) => s"gold:$n" -> df
      } ++ RetryRehearsal.QueryTargets.map { q =>
        q -> SparkEntry.queries(q)(spark, sfDir)
      }).map { case (name, df) =>
        val rows = df.collect()
        name -> ((rows.length, SpillRehearsal.digest(rows)))
      }.toMap
    expected.foreach { case (q, (n, _)) =>
      assert(n > 0, s"$q fixture must be non-trivial at sf0.01")
    }

    val (exit, lines) = RehearsalSpawn.run("graft.RetryRehearsal", "-Xmx4g", sfDir)
    val log = lines.mkString("\n")
    assert(exit === 0,
      s"rehearsal JVM must survive the injected faults (retry, not die); tail:\n${lines.takeRight(40).mkString("\n")}")

    val line = ("\"target\":\"([a-z_:]+)\",\"rows\":(\\d+),\"digest\":\"([0-9a-f]+)\"," +
      "\"fs_faults\":(\\d+),\"killed\":(\\d+),\"retried_ok\":(\\d+)").r
    val got = line.findAllMatchIn(log).map { m =>
      m.group(1) -> ((m.group(2).toInt, m.group(3), m.group(4).toLong,
        m.group(5).toLong, m.group(6).toLong))
    }.toMap
    assert(got.keySet === expected.keySet,
      s"every rehearsed target must report; got ${got.keySet}")
    expected.foreach { case (name, (n, digest)) =>
      val (gn, gd, _, _, _) = got(name)
      assert((gn, gd) === ((n, digest)),
        s"$name under killed/failed first attempts must match the unfaulted run exactly")
    }

    // the evidence half: faults must have been INJECTED and retries must
    // have SUCCEEDED, or the equality above is vacuous
    val totals = ("\"gold_write_faults\":(\\d+),\"total_fs_faults\":(\\d+)," +
      "\"total_killed\":(\\d+),\"total_retried_ok\":(\\d+)").r
    val t = totals.findFirstMatchIn(log).map(m =>
      (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong))
    assert(t.isDefined, "missing totals line")
    val (goldWriteFaults, fsFaults, killed, retriedOk) = t.get
    assert(fsFaults > 0L,
      "the FS injector must have failed at least one scan/write first attempt")
    assert(goldWriteFaults > 0L,
      "faults must land during the EAGER gold-build materialization — zero " +
        "means the builds ran before arming and the committer-isolation " +
        "claim is vacuous (the first-cut bug)")
    assert(killed > 0L,
      "the kill listener must have killed at least one first attempt " +
        "(shuffle-read stages are only covered by kills)")
    assert(retriedOk >= fsFaults,
      "every FS-faulted task must have retried to success " +
        s"(fs_faults=$fsFaults retried_ok=$retriedOk)")
  }

  test("killed and failed first attempts: the five streaming standing-store processors retry to bit-identical store state") {
    // unfaulted baseline in the suite session — the same shared sequence
    // StreamSpillRehearsal's spec uses, so all three rehearsal quadrants
    // (memory, batch retry, streaming retry) pin against one truth
    val expected = StreamSpillRehearsal.runAll(spark)
      .map { case (op, n, d) => op -> ((n, d)) }.toMap

    val (exit, lines) = RehearsalSpawn.run("graft.StreamRetryRehearsal", "-Xmx3g")
    val log = lines.mkString("\n")
    assert(exit === 0,
      s"streaming retry JVM must survive the injected faults; tail:\n${lines.takeRight(40).mkString("\n")}")

    val line = "\"op\":\"([a-z_]+)\",\"store_rows\":(\\d+),\"digest\":\"([0-9a-f]+)\"".r
    val got = line.findAllMatchIn(log)
      .map(m => m.group(1) -> ((m.group(2).toLong, m.group(3)))).toMap
    assert(got.keySet === expected.keySet, s"every processor must report: $got")
    expected.foreach { case (op, (n, d)) =>
      assert(got(op) === ((n, d)),
        s"$op standing-store state under killed/failed first attempts must match the unfaulted run exactly")
    }
    val totals = ("\"total_fs_faults\":(\\d+),\"total_killed\":(\\d+)," +
      "\"total_retried_ok\":(\\d+)").r
    val t = totals.findFirstMatchIn(log).map(m =>
      (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong))
    assert(t.isDefined, "missing totals line")
    val (fsFaults, killed, retriedOk) = t.get
    assert(fsFaults > 0L && killed > 0L && retriedOk > 0L,
      s"faults must be observed (fs=$fsFaults killed=$killed retried=$retriedOk)")
  }
}
