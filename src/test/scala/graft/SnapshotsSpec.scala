package graft

import java.nio.file.Files

import graft.ops.Snapshots

/** Dataset snapshot versioning: immutability, pointer atomicity semantics,
  * crash invisibility, and retention.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("published versions are immutable; latest follows the pointer") {
    val root = Files.createTempDirectory("snap").toString + "/corpus"
    val v1 = Snapshots.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "t"), root)
    val v2 = Snapshots.publish(Seq((1L, "a"), (3L, "c")).toDF("id", "t"), root)
    assert((v1, v2) === ((1L, 2L)))
    assert(Snapshots.latestVersion(spark, root) === Some(2L))
    assert(Snapshots.readLatest(spark, root).as[(Long, String)]
      .collect().sortBy(_._1).toSeq === Seq((1L, "a"), (3L, "c")))
    // the pinned old version re-reads unchanged — reproducibility
    assert(Snapshots.readVersion(spark, root, 1L).as[(Long, String)]
      .collect().sortBy(_._1).toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("a publish crashed MID-WRITE leaves only hidden staging — no version, no number") {
    val root = Files.createTempDirectory("snap2").toString + "/corpus"
    Snapshots.publish(Seq((1L, "a")).toDF("id", "t"), root)
    // simulate the crash: partial data sits in the hidden staging dir, the
    // version rename never happened
    Seq((9L, "z")).toDF("id", "t").write.parquet(s"$root/.staging-v=2")
    assert(Snapshots.versions(spark, root) === Seq(1L),
      "a partial never becomes a version")
    assert(Snapshots.latestVersion(spark, root) === Some(1L))
    // recovery = just publish again: the staging debris is overwritten and
    // the new publish takes the number the crash never consumed
    val v = Snapshots.publish(Seq((7L, "y")).toDF("id", "t"), root)
    assert(v === 2L, "the crashed attempt consumed no version number")
    assert(Snapshots.readLatest(spark, root).as[(Long, String)]
      .collect().toSeq === Seq((7L, "y")))
  }

  test("a publish crashed between version rename and pointer swap leaves a readable orphan") {
    val root = Files.createTempDirectory("snap2b").toString + "/corpus"
    Snapshots.publish(Seq((1L, "a")).toDF("id", "t"), root)
    // crash AFTER the rename: v=2 is complete on disk, pointer still at 1
    Seq((9L, "z")).toDF("id", "t").write.parquet(s"$root/v=2")
    assert(Snapshots.latestVersion(spark, root) === Some(1L),
      "readers resolve through the pointer — the unreferenced publish is invisible")
    assert(Snapshots.versions(spark, root) === Seq(1L, 2L),
      "but the orphan is a COMPLETE version (data committed before rename)")
    val v = Snapshots.publish(Seq((7L, "y")).toDF("id", "t"), root)
    assert(v === 3L)
    assert(Snapshots.readLatest(spark, root).as[(Long, String)]
      .collect().toSeq === Seq((7L, "y")))
  }

  test("a reader landing inside the pointer swap gap resolves via the tmp side") {
    val root = Files.createTempDirectory("snap4").toString + "/corpus"
    Snapshots.publish(Seq((1L, "a")).toDF("id", "t"), root)
    // simulate the delete→rename gap: pointer gone, tmp fully written
    val dir = new java.io.File(root)
    val w = new java.io.PrintWriter(new java.io.File(dir, "_latest.tmp"), "UTF-8")
    w.print("1"); w.close()
    assert(new java.io.File(dir, "_latest").delete())
    assert(Snapshots.latestVersion(spark, root) === Some(1L),
      "the tmp pointer is complete before the swap starts — readers never blank out")
    assert(Snapshots.readLatest(spark, root).count() === 1L)
  }

  test("prune drops oldest versions but never the pointer target") {
    val root = Files.createTempDirectory("snap3").toString + "/corpus"
    (1 to 4).foreach(i => Snapshots.publish(Seq((i.toLong, "x")).toDF("id", "t"), root))
    val dropped = Snapshots.prune(spark, root, keep = 2)
    assert(dropped === Seq(1L, 2L))
    assert(Snapshots.versions(spark, root) === Seq(3L, 4L))
    assert(Snapshots.readLatest(spark, root).as[(Long, String)]
      .collect().toSeq === Seq((4L, "x")))
  }

  test("a FAILED staging rename aborts the publish before the pointer moves") {
    // Hadoop FileSystem.rename reports failure by returning false (e.g. the
    // destination already exists). A silently-ignored failure would advance
    // the pointer to a version dir that doesn't exist, breaking the
    // invariant that the pointer always names a committed readable version.
    val root = Files.createTempDirectory("snap4").toString + "/corpus"
    Snapshots.publish(Seq((1L, "a")).toDF("id", "t"), root)
    assert(Snapshots.latestVersion(spark, root) === Some(1L))
    // sabotage: occupy the NEXT version's slot with a plain file — the
    // local-FS rename of staging onto it must return false, not throw
    val blocker = new java.io.File(s"$root/v=2")
    assert(blocker.createNewFile())
    // local FS surfaces this either as rename→false (our require throws
    // IllegalArgumentException) or as an IOException from Hadoop's copy
    // fallback — both must abort the publish loudly, never silently
    val failed =
      try { Snapshots.publish(Seq((2L, "b")).toDF("id", "t"), root); false }
      catch {
        case _: IllegalArgumentException | _: java.io.IOException => true
      }
    assert(failed, "a blocked version rename must fail the publish loudly")
    // the pointer still names the last COMMITTED version and resolves
    assert(Snapshots.latestVersion(spark, root) === Some(1L),
      "a failed publish must not move the pointer")
    assert(Snapshots.readLatest(spark, root).as[(Long, String)]
      .collect().toSeq === Seq((1L, "a")))
  }
}
