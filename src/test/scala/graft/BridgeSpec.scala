package graft

import org.apache.spark.sql.functions._

/** [[org.apache.spark.sql.graftbridge.bridge.truncated]] — the iterative-
  * loop materialization boundary — is load-bearing infrastructure for
  * every fixpoint operator (k-core, components, and any future loop), so
  * its three contracts get their own pins:
  *
  *   1. rows/schema survive the InternalRow round-trip (including the
  *      UnsafeRow-reuse copy — forgetting `.copy()` makes every cached row
  *      the LAST row of its partition, a classic corruption);
  *   2. the PHYSICAL output partitioning survives onto the leaf, so a
  *      loop's next round joins on the carried key exchange-free (dropping
  *      it measured pair_components 1.5 s → 3.0 s — every round re-shuffled
  *      both sides);
  *   3. row-count stats survive, so a small carried frame still broadcasts
  *      (a stats-free leaf defaults to defaultSizeInBytes = huge and the
  *      k-core output plan regressed 1 → 4 live exchanges).
  */
class BridgeSpec extends SparkSpec {
  import spark.implicits._

  private val bridge = org.apache.spark.sql.graftbridge.bridge

  test("truncated: rows, schema, and distinct row VALUES survive the round-trip") {
    val df = (1L to 100L).map(i => (i, s"v$i", i * 0.5)).toDF("k", "s", "d")
      .repartition(8)
    val t = bridge.truncated(df)
    assert(t.schema === df.schema)
    val got = t.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got.size === 100, "an uncopied UnsafeRow buffer collapses rows")
    assert(got === (1L to 100L).map(i => (i, s"v$i", i * 0.5)).toSet)
  }

  test("truncated: the plan is a leaf — lineage and constraints are gone") {
    val df = spark.range(10).select(col("id"), (col("id") * 2).as("k"))
      .filter(col("k") > 2)
    val t = bridge.truncated(df)
    // analyzed plan is a bare leaf: no Filter/Project ancestry to re-walk
    assert(t.queryExecution.analyzed.children.isEmpty,
      s"expected a leaf, got:\n${t.queryExecution.analyzed}")
    assert(t.queryExecution.analyzed.constraints.isEmpty,
      "constraints must be dropped — they double per generation in " +
        "two-reference loops")
  }

  test("truncated: groupBy hash partitioning survives — the next round's join adds no exchange on that side") {
    // pin AQE partition coalescing off for the assertion: with it on, the
    // tiny frame coalesces to a CoalescedHashPartitioning the STATIC
    // planner can't match (bridge then truthfully degrades — see its
    // coalescing ladder — rather than claiming a wrong hash layout)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val df = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s"))
      val t = bridge.truncated(df)
      // join the truncated frame with a LARGE frame on k: the truncated
      // side is already hash-partitioned on k, so the only exchange under
      // the join should be on the other (freshly scanned) side
      val big = spark.range(100000).select((col("id") % 50).as("k"), col("id").as("w"))
        .repartition(13) // deliberately not k-partitioned
      val joined = t.join(big.hint("merge"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
      assert(exchanges === 1,
        s"only the non-truncated side should exchange; got $exchanges in:\n$physical")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("truncated: a coalesced-to-one frame truthfully claims SinglePartition, never a wrong hash layout") {
    // default AQE coalescing: 50 groups of tiny data collapse to one
    // partition; claiming hash(k, 4) would misroute any exchange-elided
    // join, SinglePartition is the truthful (and still useful) claim
    val df = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    val t = bridge.truncated(df)
    if (t.rdd.getNumPartitions == 1) {
      val part = t.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].outputPartitioning
      assert(part.toString === "SinglePartition", s"got $part")
    }
    // whatever was claimed, results stay correct through a join
    val other = (0L until 50L).map(i => (i, i * 10)).toDF("k", "t")
    val j = t.join(other, "k").agg(sum(col("s") * col("t"))).collect()
    assert(j.head.getLong(0) ===
      (1L to 1000L).map(i => (i % 50, i)).groupBy(_._1).toSeq
        .map { case (k, vs) => vs.map(_._2).sum * k * 10 }.sum)
  }

  test("truncated: row-count stats survive — a small truncated frame still broadcasts") {
    val small = bridge.truncated(
      (1L to 20L).map(i => (i, s"n$i")).toDF("k", "name"))
    val st = small.queryExecution.analyzed.stats
    assert(st.rowCount.contains(BigInt(20)), s"rowCount lost: $st")
    assert(st.sizeInBytes < 100000, s"size estimate not row-derived: $st")
    val big = spark.range(100000).select((col("id") % 20 + 1).as("k"), col("id").as("w"))
    val joined = big.join(small, "k")
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"small truncated side must broadcast:\n$physical")
  }
}
