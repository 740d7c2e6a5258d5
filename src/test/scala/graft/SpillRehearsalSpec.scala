package graft

import scala.sys.process.{Process, ProcessLogger}

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

  // Spark 4 on JDK 17 outside spark-submit (mirrors build.sbt javaOptions)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("starved memory manager: shuffle/graph-loop/window/expand/gold-build matrix spills to completion, rows identical") {
    val sfDir = "/root/testdata/sf0.01"
    val expected = SpillRehearsal.Queries.map { q =>
      val rows = SparkEntry.queries(q)(spark, sfDir).collect()
      q -> ((rows.length, SpillRehearsal.digest(rows)))
    }.toMap
    expected.foreach { case (q, (n, _)) =>
      assert(n > 0, s"$q fixture must be non-trivial at sf0.01")
    }

    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      // modest heap on purpose: the STARVATION comes from
      // spark.testing.memory inside the rehearsal, the heap just has to
      // hold the JVM + collected results without masking an OOM as GC hell
      "-Xmx2g", "-XX:+UseG1GC",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.SpillRehearsal", sfDir)
    // ProcessLogger pumps stdout and stderr on two threads — the sink must
    // be thread-safe or a lost append can drop a SPILLJSON line flakily
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val exit = Process(cmd).!(ProcessLogger(out.add(_), out.add(_)))
    import scala.jdk.CollectionConverters._
    val lines = out.asScala.toSeq
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
  }

  test("starved memory manager: the four streaming standing-store merge paths spill to bit-identical store state") {
    // unconstrained baseline in the suite session — the SAME batch
    // sequence the subprocess drives (shared through runAll, so the two
    // sides cannot drift)
    val expected = StreamSpillRehearsal.runAll(spark)
      .map { case (op, n, d) => op -> ((n, d)) }.toMap
    expected.foreach { case (op, (n, _)) =>
      assert(n > 0, s"$op store must be non-trivial after the sequence")
    }

    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-XX:+UseG1GC",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.StreamSpillRehearsal")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val exit = Process(cmd).!(ProcessLogger(out.add(_), out.add(_)))
    import scala.jdk.CollectionConverters._
    val lines = out.asScala.toSeq
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
