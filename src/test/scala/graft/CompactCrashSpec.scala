package graft

import scala.sys.process.{Process, ProcessLogger}

/** [[CompactCrashRehearsal]] — JVM-kill rehearsal for the catalog-atomic
  * compaction. `compactPartitionsCatalog`'s torn-read-free and
  * never-reuse-a-live-name claims are argued at exactly two boundaries
  * (fresh `__c<k>` written / catalog flipped), and only a crash exercises
  * them: this spec `Runtime.halt(13)`s a subprocess at each boundary
  * against a Derby-backed Hive metastore that survives the kill, then
  * asserts from a fresh JVM that
  *
  *   - the table reads complete and row-identical at every crash point
  *     (old location pre-flip, new location post-flip — never torn),
  *   - re-running maintenance converges and never reuses the stranded
  *     `__c<k>` name,
  *   - the orphans sweep exactly once (second sweep is a no-op),
  *   - a further maintenance pass is quiescent.
  */
class CompactCrashSpec extends SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(args: String*): (Int, Seq[String]) = {
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-XX:+UseG1GC", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.CompactCrashRehearsal") ++ args
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val exit = Process(cmd).!(ProcessLogger(out.add(_), out.add(_)))
    import scala.jdk.CollectionConverters._
    (exit, out.asScala.toSeq)
  }

  private def field(line: String, key: String): String = {
    val m = (s""""$key":("[^"]*"|\\[[^\\]]*\\]|[0-9]+|true|false)""").r
      .findFirstMatchIn(line)
    assert(m.isDefined, s"missing $key in: $line")
    m.get.group(1).stripPrefix("\"").stripSuffix("\"")
  }

  private def arrField(line: String, key: String): Seq[String] = {
    val raw = field(line, key)
    if (raw == "[]" || raw.isEmpty) Seq.empty
    else raw.stripPrefix("[").stripSuffix("]")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
  }

  private def crashLine(lines: Seq[String], tag: String): String = {
    val l = lines.find(s => s.startsWith("CRASHJSON") &&
      s.contains(s""""tag":"$tag""""))
    assert(l.isDefined, s"no CRASHJSON line for $tag in:\n${lines.takeRight(30).mkString("\n")}")
    l.get
  }

  private def rehearse(boundary: String): Unit = {
    val work = java.nio.file.Files
      .createTempDirectory(s"graft-ccr-$boundary-").toString

    val (seedExit, seedOut) = spawn("seed", work)
    assert(seedExit === 0, s"seed failed:\n${seedOut.takeRight(25).mkString("\n")}")
    val seed = crashLine(seedOut, "seed")
    val seedDigest = field(seed, "digest")
    assert(field(seed, "rows") === "600")
    assert(arrField(seed, "locs") === Seq("dt=0->dt=0", "dt=1->dt=1"))

    val (crashExit, crashOut) = spawn("crash", work, boundary)
    assert(crashExit === 13,
      s"the JVM must die AT the boundary (halt 13), got $crashExit:\n${crashOut.takeRight(25).mkString("\n")}")
    assert(field(crashLine(crashOut, "crash"), "halting") === "true")

    val (vExit, vOut) = spawn("verify", work)
    assert(vExit === 0, s"verify failed:\n${vOut.takeRight(40).mkString("\n")}")

    // 1. torn-read-free at the crash point: complete, row-identical read,
    //    and the catalog points at exactly the side the boundary implies
    val pc = crashLine(vOut, "post_crash")
    assert(field(pc, "rows") === "600", "post-crash read must be complete")
    assert(field(pc, "digest") === seedDigest,
      s"post-crash read must be row-identical to the seed ($boundary)")
    val pcLocs = arrField(pc, "locs")
    if (boundary == "after_rewrite") {
      assert(pcLocs === Seq("dt=0->dt=0", "dt=1->dt=1"),
        "pre-flip crash: the catalog must still point at the OLD leaf")
      assert(arrField(pc, "leaves").contains("dt=0__c1"),
        "the stranded rewrite must be on disk (it becomes the orphan)")
    } else {
      assert(pcLocs === Seq("dt=0->dt=0__c1", "dt=1->dt=1"),
        "post-flip crash: the catalog must already point at the NEW leaf")
    }

    // 2. convergence + never-reuse-a-live-name
    val rm = crashLine(vOut, "post_remaint")
    assert(field(rm, "digest") === seedDigest)
    val rmLocs = arrField(rm, "locs")
    if (boundary == "after_rewrite")
      // dt=0's recovery compaction must SKIP the stranded __c1 name
      assert(rmLocs === Seq("dt=0->dt=0__c2", "dt=1->dt=1__c1"),
        s"stranded __c1 must never be reused: $rmLocs")
    else {
      assert(rmLocs === Seq("dt=0->dt=0__c1", "dt=1->dt=1__c1"))
      assert(arrField(crashLine(vOut, "remaint"), "compacted") === Seq("dt='1'"),
        "the already-flipped partition must not re-compact")
    }

    // 3. exactly-once sweep
    val sw = crashLine(vOut, "sweep")
    val swept = arrField(sw, "swept")
    val expectedOrphans =
      if (boundary == "after_rewrite") Set("dt=0", "dt=1", "dt=0__c1")
      else Set("dt=0", "dt=1")
    assert(swept.toSet === expectedOrphans,
      s"sweep must remove exactly the orphans: got $swept")
    assert(arrField(sw, "swept_again").isEmpty, "second sweep must be a no-op")

    // 4. reads stay green after the sweep; only live locations remain
    val ps = crashLine(vOut, "post_sweep")
    assert(field(ps, "digest") === seedDigest)
    assert(arrField(ps, "leaves").toSet ===
      arrField(ps, "locs").map(_.split("->")(1)).toSet,
      "after the sweep, disk must hold exactly the registered locations")

    // 5. quiescence
    assert(arrField(crashLine(vOut, "quiesce"), "compacted").isEmpty,
      "a further maintenance pass must be a no-op")
  }

  test("JVM killed after the __c rewrite, before the catalog flip: consistent reads, converging recovery, no name reuse, exactly-once sweep") {
    rehearse("after_rewrite")
  }

  test("JVM killed after the catalog flip, before the sweep: consistent reads on the new location, exactly-once sweep, quiescent maintenance") {
    rehearse("after_flip")
  }
}
