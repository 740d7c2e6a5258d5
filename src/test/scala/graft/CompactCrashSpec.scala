package graft

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

  private def spawn(args: String*): (Int, Seq[String]) =
    RehearsalSpawn.run("graft.CompactCrashRehearsal", "-Xmx3g", args: _*)

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
    //    and the catalog points at exactly the side the boundary implies.
    //    WHICH partition the crash struck is whichever one the metastore
    //    listed first — not a contract (HMS return order is unspecified) —
    //    so it is DERIVED from the artifact, never hard-coded.
    val pc = crashLine(vOut, "post_crash")
    assert(field(pc, "rows") === "600", "post-crash read must be complete")
    assert(field(pc, "digest") === seedDigest,
      s"post-crash read must be row-identical to the seed ($boundary)")
    val pcLocs = arrField(pc, "locs")
    val parts = Seq("dt=0", "dt=1")
    val struck =
      if (boundary == "after_rewrite") {
        assert(pcLocs === parts.map(d => s"$d->$d"),
          "pre-flip crash: the catalog must still point at the OLD leaves")
        val stranded = arrField(pc, "leaves").filter(_.contains("__c"))
        assert(stranded.length === 1 && stranded.head.endsWith("__c1"),
          s"exactly one stranded __c1 rewrite must be on disk: $stranded")
        stranded.head.stripSuffix("__c1")
      } else {
        val flipped = pcLocs.filter(_.contains("__c1"))
        assert(flipped.length === 1,
          s"post-flip crash: exactly one partition must be flipped: $pcLocs")
        val s = flipped.head.split("->")(0)
        assert(pcLocs === parts.map(d =>
          if (d == s) s"$d->${d}__c1" else s"$d->$d"),
          "post-flip crash: the catalog must point at the NEW leaf for the struck partition only")
        s
      }
    val other = parts.filterNot(_ == struck).head

    // 2. convergence + never-reuse-a-live-name
    val rm = crashLine(vOut, "post_remaint")
    assert(field(rm, "digest") === seedDigest)
    val rmLocs = arrField(rm, "locs")
    if (boundary == "after_rewrite")
      // the struck partition's recovery compaction must SKIP the stranded
      // __c1 name; the untouched partition compacts to its own __c1
      assert(rmLocs === parts.map(d =>
        if (d == struck) s"$d->${d}__c2" else s"$d->${d}__c1"),
        s"stranded __c1 must never be reused: $rmLocs")
    else {
      assert(rmLocs === parts.map(d => s"$d->${d}__c1"))
      assert(arrField(crashLine(vOut, "remaint"), "compacted") ===
        Seq(s"dt='${other.stripPrefix("dt=")}'"),
        "the already-flipped partition must not re-compact")
    }

    // 3. exactly-once sweep
    val sw = crashLine(vOut, "sweep")
    val swept = arrField(sw, "swept")
    val expectedOrphans =
      if (boundary == "after_rewrite") Set(struck, other, s"${struck}__c1")
      else Set(struck, other)
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
