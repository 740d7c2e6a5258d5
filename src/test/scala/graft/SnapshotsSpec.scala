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

  test("a crashed publish (data written, pointer not moved) stays invisible and heals") {
    val root = Files.createTempDirectory("snap2").toString + "/corpus"
    Snapshots.publish(Seq((1L, "a")).toDF("id", "t"), root)
    // simulate the crash window: v=2 data fully written, pointer untouched
    Seq((9L, "z")).toDF("id", "t").write.parquet(s"$root/v=2")
    assert(Snapshots.latestVersion(spark, root) === Some(1L),
      "readers resolve through the pointer — the orphan is invisible")
    assert(Snapshots.readLatest(spark, root).count() === 1L)
    // re-running the publish is the documented recovery: it rewrites the
    // partial dir before the pointer ever moves there
    val v = Snapshots.publish(Seq((7L, "y")).toDF("id", "t"), root)
    assert(v === 3L, "the orphan still consumed its version number")
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
}
