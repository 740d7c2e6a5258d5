package graft

import org.apache.spark.sql.functions._

import graft.ops.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "a", 10L), (2L, "b", 11L), (3L, "c", 12L))
    .toDF("k", "v", "seq")

  test("applyChangelog upserts, deletes, and passes untouched keys through") {
    // k=1 updated twice (latest wins), k=2 deleted, k=3 untouched,
    // k=4 inserted, k=5 insert-then-delete (nets to absent)
    val changes = Seq(
      (1L, 20L, "U", "a2"), (1L, 21L, "U", "a3"),
      (2L, 22L, "D", null), (4L, 23L, "I", "d1"),
      (5L, 24L, "I", "e1"), (5L, 25L, "D", null))
      .toDF("k", "seq", "op", "v")
    val out = Merge.applyChangelog(snapshot, changes, "k", "seq", "op",
      Seq("v", "seq"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out === Seq(
      (1L, "a3", 21L, true),   // latest update wins
      (3L, "c", 12L, false),   // untouched snapshot row
      (4L, "d1", 23L, true)))  // pure insert
  }

  test("applyChangelog: a NULL net op upserts (anything-but-D contract)") {
    val changes = Seq((1L, 20L, null.asInstanceOf[String], "a9"))
      .toDF("k", "seq", "op", "v")
    val out = Merge.applyChangelog(snapshot, changes, "k", "seq", "op", Seq("v"))
      .filter(col("k") === 1L).select("v", "changed")
      .as[(String, Boolean)].collect()
    assert(out.toSeq === Seq(("a9", true)))
  }

  test("applyChangelog: an upsert can null out a payload field (MERGE SET semantics)") {
    // CDC sources clear fields with NULL in the change row — the snapshot
    // value must NOT resurrect through a coalesce
    val changes = Seq((1L, 20L, "U", null.asInstanceOf[String]))
      .toDF("k", "seq", "op", "v")
    val out = Merge.applyChangelog(snapshot, changes, "k", "seq", "op", Seq("v"))
      .filter(col("k") === 1L).select("v", "changed")
      .as[(Option[String], Boolean)].collect()
    assert(out.toSeq === Seq((None, true)))
  }

  test("applyChangelog with an empty changelog is the snapshot") {
    val changes = Seq.empty[(Long, Long, String, String)]
      .toDF("k", "seq", "op", "v")
    val out = Merge.applyChangelog(snapshot, changes, "k", "seq", "op",
      Seq("v", "seq"))
    assert(out.count() === 3)
    assert(out.filter(col("changed")).count() === 0)
  }

  test("applyChangelog is idempotent: replaying a batch is a no-op") {
    // checkpoint-recovery replays the last micro-batch — the merged snapshot
    // must absorb it without drift (what StreamingUpsert's contract needs)
    val rng = new scala.util.Random(42)
    val changes = (1 to 200).map { i =>
      val k = rng.nextInt(30).toLong
      (k, 100L + i, if (rng.nextInt(5) == 0) "D" else "U", s"v$i")
    }.toDF("k", "seq", "op", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "seq").as[(Long, String, Long)]
        .collect().sortBy(_._1).toSeq
    val once = Merge.applyChangelog(snapshot, changes, "k", "seq", "op",
      Seq("v", "seq"))
    val twice = Merge.applyChangelog(once.drop("changed"), changes,
      "k", "seq", "op", Seq("v", "seq"))
    assert(canon(once) === canon(twice))
  }

  test("scd2 builds contiguous validity intervals with one current row per key") {
    val changes = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (1L, "2024-01-02 00:00:00", 2L, 2.0),
      (1L, "2024-01-03 00:00:00", 3L, 3.0),
      (2L, "2024-01-05 00:00:00", 4L, 9.0))
      .toDF("k", "ts", "seq", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Merge.scd2(changes, "k", "ts", "seq", Seq("v"))
    // versions are 1..n per key in ts order
    assert(out.filter(col("k") === 1L).orderBy("version")
      .select("version").as[Long].collect() === Seq(1L, 2L, 3L))
    // each interval closes at the next one's start
    val k1 = out.filter(col("k") === 1L).orderBy("version")
      .select(col("valid_from").cast("long"), col("valid_to").cast("long"))
      .as[(Long, Option[Long])].collect()
    assert(k1.sliding(2).forall {
      case Array((_, Some(to)), (from2, _)) => to == from2
      case _ => true
    })
    // exactly one open (current) interval per key
    assert(out.filter(col("is_current")).groupBy("k").count()
      .select("count").as[Long].collect().forall(_ == 1L))
    assert(out.filter(col("k") === 2L && col("is_current")).count() === 1)
  }

  test("chunk dedup reports cross-document duplicate mass, first doc wins") {
    import graft.ops.Dedup
    val a = (1 to 8).map(i => s"w$i").mkString(" ")  // chunk A (8 tokens)
    val b = (9 to 16).map(i => s"w$i").mkString(" ") // chunk B
    val c = (17 to 24).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, s"$a $b"),  // defines A and B
      (2L, s"$a $c"),  // A is a dup (doc 1 owns it), C fresh
      (3L, s"$b $c")   // both chunks already seen
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 8)
      .select("doc_id", "n_chunks", "n_dup_chunks").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 2L, 0L), (2L, 2L, 1L), (3L, 2L, 2L)))
  }

  test("mergeAdditive: merge(agg(old), agg(new)) equals agg(old ∪ new)") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (rng.nextInt(20).toLong, s"d${rng.nextInt(5)}", rng.nextInt(1000).toLong)
    }
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k", "day").agg(
        count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val (old, fresh) = rows.splitAt(250)
    val merged = Merge.mergeAdditive(
      agg(old.toDF("k", "day", "v")), agg(fresh.toDF("k", "day", "v")),
      Seq("k", "day"), Seq("n", "s"), minCols = Seq("mn"), maxCols = Seq("mx"))
    val full = agg(rows.toDF("k", "day", "v"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "day", "n", "s", "mn", "mx")
        .as[(Long, String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(canon(merged) === canon(full))
  }

  test("mergeAdditive: one-sided keys pass through unchanged") {
    val standing = Seq((1L, 5L, 2L), (2L, 7L, 3L)).toDF("k", "s", "mx")
    val delta = Seq((2L, 1L, 9L), (3L, 4L, 1L)).toDF("k", "s", "mx")
    val out = Merge.mergeAdditive(standing, delta, Seq("k"), Seq("s"),
        maxCols = Seq("mx"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 5L, 2L), (2L, 8L, 9L), (3L, 4L, 1L)))
  }

  test("scd2 tiebreaks equal timestamps by the sequence column") {
    val changes = Seq(
      (1L, "2024-01-01 00:00:00", 2L, 20.0),
      (1L, "2024-01-01 00:00:00", 1L, 10.0))
      .toDF("k", "ts", "seq", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Merge.scd2(changes, "k", "ts", "seq", Seq("v"))
      .orderBy("version").select("v").as[Double].collect()
    assert(out === Seq(10.0, 20.0)) // seq=1 is version 1
  }
}
