package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val ranges = Seq(
    ("a", 0.0, 10.0), ("b", 10.0, 25.0), ("c", 20.0, 40.0)) // b/c overlap
    .toDF("name", "lo", "hi")

  test("binned range join matches brute-force containment, incl. overlaps") {
    val probe = Seq(0.0, 5.0, 9.999, 10.0, 22.0, 24.999, 39.0, 40.0, 41.0)
      .toDF("v")
    for (w <- Seq(3.0, 10.0, 50.0)) { // bin width smaller/equal/larger than intervals
      val got = RangeJoin.binnedRangeJoin(probe, col("v"), ranges, "lo", "hi", w)
        .select("v", "name").as[(Double, String)].collect().toSet
      val want = (for {
        v <- Seq(0.0, 5.0, 9.999, 10.0, 22.0, 24.999, 39.0, 40.0, 41.0)
        (n, lo, hi) <- Seq(("a", 0.0, 10.0), ("b", 10.0, 25.0), ("c", 20.0, 40.0))
        if v >= lo && v < hi
      } yield (v, n)).toSet
      assert(got === want, s"binWidth=$w")
    }
    // half-open: 40.0 matches nothing, 22.0 matches both overlapping bands
    val got = RangeJoin.binnedRangeJoin(probe, col("v"), ranges, "lo", "hi", 10.0)
      .select("v", "name").as[(Double, String)].collect()
    assert(!got.exists(_._1 == 40.0))
    assert(got.filter(_._1 == 22.0).map(_._2).sorted === Seq("b", "c"))
  }

  test("malformed interval (hi < lo) is a benign no-match, not an error") {
    val probe = Seq(5.0, 7.0).toDF("v")
    val bad = Seq(("ok", 0.0, 10.0), ("bad", 10.0, 3.0)).toDF("name", "lo", "hi")
    val got = RangeJoin.binnedRangeJoin(probe, col("v"), bad, "lo", "hi", 2.0)
      .select("v", "name").as[(Double, String)].collect()
    assert(got.forall(_._2 == "ok") && got.length === 2)
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    val probe = Seq.tabulate(100)(i => i.toDouble).toDF("v")
    val plan = RangeJoin.binnedRangeJoin(probe, col("v"), ranges, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Join")) // hash or sort-merge equi-join on the bin
  }
}
