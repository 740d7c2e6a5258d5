package graft

import org.apache.spark.sql.functions._

import graft.ops.Indexing

class IndexingSpec extends SparkSpec {
  import spark.implicits._

  test("globalIndex: contiguous 0-based ids in key order across partitions") {
    // shuffled input over several partitions; keys 0..499 unique
    val df = scala.util.Random.shuffle((0L until 500L).toList)
      .toDF("k").repartition(7)
    val out = Indexing.globalIndex(df, "k", numPartitions = 5)
      .select("k", "global_idx").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq === (0L until 500L))   // idx follows key order
    assert(out.map(_._1).toSeq === (0L until 500L))
  }

  test("globalIndex matches row_number over the key and keeps other columns") {
    val df = Seq((30L, "c"), (10L, "a"), (20L, "b")).toDF("k", "v")
    val out = Indexing.globalIndex(df, "k").orderBy("global_idx")
      .select("k", "v", "global_idx").as[(Long, String, Long)].collect()
    assert(out.toSeq === Seq((10L, "a", 0L), (20L, "b", 1L), (30L, "c", 2L)))
  }

  test("shuffleIndex: a reproducible permutation that differs across seeds") {
    val df = (0L until 200L).toDF("k")
    def perm(seed: Long) = Indexing.shuffleIndex(df, "k", seed)
      .orderBy("global_idx").select("k").as[Long].collect().toSeq
    val e0 = perm(0)
    assert(e0.sorted === (0L until 200L))          // a permutation, nothing lost
    assert(e0 === perm(0))                         // same seed → same order
    assert(e0 !== perm(1))                         // epochs differ
    assert(e0 !== (0L until 200L).toSeq)           // actually shuffled
  }

  test("globalIndex carries the 2^33 per-partition overflow guard in its live plan") {
    // the guard must ride a USED column (coalesce into __min) — if an
    // optimizer change ever prunes it, index corruption at >= 2^33 rows
    // per partition would be silent again; pin its presence in the plan
    import spark.implicits._
    val df = Indexing.globalIndex((1L to 10L).toDF("k"), "k", numPartitions = 2)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("assert_true") || plan.contains("raise_error"),
      s"the overflow fail-fast must survive optimization:\n${plan.take(400)}")
    // and it is transparent on the happy path
    assert(df.select("global_idx").as[Long].collect().sorted.toSeq ===
      (0L to 9L))
  }

  test("globalIndex: empty input yields empty output with the stamped schema") {
    val df = spark.range(0).toDF("k")
    val out = Indexing.globalIndex(df, "k")
    assert(out.columns.toSeq === Seq("k", "global_idx"))
    assert(out.count() === 0)
  }
}
