package graft

import org.apache.spark.sql.types._

/** Canary against silent testdata regeneration: round 7 lost 55 queries and
  * the whole bench because `events.ts` changed parquet physical type under
  * the repo (NANOS → MICROS). If this spec fails, fix `engine.Tables.events`
  * (src/main/scala/graft/engine/Tables.scala) FIRST — everything events-backed
  * is downstream of that one loader.
  */
class TestdataCanarySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("events loads with ts as session-zone timestamp — else fix Tables.events") {
    val df = engine.Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts surfaced as ${df.schema("ts").dataType}; the testdata parquet " +
        "physical type likely changed again — adapt engine.Tables.events")
    val expected = Set("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(df.columns.toSet == expected,
      s"events columns drifted: got ${df.columns.sorted.mkString(",")} — adapt engine.Tables.events")
    assert(df.limit(1).count() == 1, "events.parquet is empty/unreadable")
  }

  test("events ts values land in a sane epoch range (no unit mix-up)") {
    import org.apache.spark.sql.functions._
    val r = engine.Tables.events(spark, sfDir)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (r.getInt(0), r.getInt(1))
    assert(lo >= 1990 && hi <= 2100,
      s"events.ts years span [$lo,$hi] — a nanos/micros/millis mix-up in Tables.events")
  }

  test("(user_id, ts) is unique in events — od_flows endpoint determinism rests on it") {
    import org.apache.spark.sql.functions._
    val dups = engine.Tables.events(spark, sfDir)
      .groupBy("user_id", "ts").count().filter(col("count") > 1).count()
    assert(dups === 0L,
      "events grew duplicate (user_id, ts) rows — min_by/arg_min trip endpoints " +
        "become tie-dependent; add event_id to the od_flows endpoint ordering key")
  }

  test("every other table still carries the columns the queries compile against") {
    val expected = Map(
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "region" -> Set("r_regionkey", "r_name"))
    val drifted = expected.flatMap { case (t, cols) =>
      val got = engine.Tables.load(spark, sfDir, t).columns.toSet
      if (got == cols) None
      else Some(s"$t: expected ${cols.toSeq.sorted.mkString(",")} got ${got.toSeq.sorted.mkString(",")}")
    }
    assert(drifted.isEmpty,
      "testdata regeneration drifted table schemas:\n" + drifted.mkString("\n"))
  }
}
