package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftExtensions

/** Optimizer-rule spec: the range-containment join rewrite must kick in
  * through the extensions hook for plain SQL, produce the same rows as the
  * nested-loop plan, and stay inert when unconfigured.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withFresh[A](f: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // NOTE: never .stop() here — the fresh session shares the JVM-wide
      // SparkContext with every other suite (same trap ExtensionsSpec avoids)
      val fresh = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(fresh)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  private def setup(s: SparkSession): Unit = {
    import s.implicits._
    (0 until 100).map(_.toDouble).toDF("v").createOrReplaceTempView("probe")
    Seq(("a", 0.0, 10.0), ("b", 10.0, 35.0), ("c", 30.0, 40.0))
      .toDF("name", "lo", "hi").createOrReplaceTempView("ranges")
  }

  private val sql =
    "SELECT p.v, r.name FROM probe p JOIN ranges r ON p.v >= r.lo AND p.v < r.hi"

  private val expected = (for {
    v <- 0 until 100
    (n, lo, hi) <- Seq(("a", 0.0, 10.0), ("b", 10.0, 35.0), ("c", 30.0, 40.0))
    if v >= lo && v < hi
  } yield (v.toDouble, n)).toSet

  test("configured rule turns the SQL range join into an equi-join, same rows") {
    withFresh { s =>
      import s.implicits._
      setup(s)
      s.conf.set("spark.graft.rangeJoinBinWidth", "10.0")
      val df = s.sql(sql)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n${plan.take(600)}")
      assert(df.as[(Double, String)].collect().toSet === expected)
      // mirrored direction: interval side written first
      val mirrored = s.sql(
        "SELECT p.v, r.name FROM ranges r JOIN probe p ON p.v >= r.lo AND p.v < r.hi")
      assert(!mirrored.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(mirrored.as[(Double, String)].collect().toSet === expected)
    }
  }

  test("rule matches either conjunct order and either bound spelling") {
    withFresh { s =>
      import s.implicits._
      setup(s)
      s.conf.set("spark.graft.rangeJoinBinWidth", "10.0")
      for (cond <- Seq(
          "r.lo <= p.v AND p.v < r.hi",   // lo on the left of <=
          "p.v < r.hi AND p.v >= r.lo",   // conjuncts reversed
          "r.hi > p.v AND r.lo <= p.v")) {// both bounds re-spelled
        val df = s.sql(s"SELECT p.v, r.name FROM probe p JOIN ranges r ON $cond")
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"rule did not fire for '$cond':\n${plan.take(400)}")
        assert(df.as[(Double, String)].collect().toSet === expected, cond)
      }
    }
  }

  test("rewritten plan treats a malformed interval (hi < lo) as a no-match") {
    withFresh { s =>
      import s.implicits._
      (0 until 20).map(_.toDouble).toDF("v").createOrReplaceTempView("probe")
      Seq(("ok", 0.0, 5.0), ("bad", 10.0, 2.0))
        .toDF("name", "lo", "hi").createOrReplaceTempView("ranges")
      s.conf.set("spark.graft.rangeJoinBinWidth", "2.0")
      // before the guard, Sequence(binLo, binHi, 1) threw on the bad row —
      // the rule must preserve the nested loop's benign no-match semantics
      val got = s.sql(sql).as[(Double, String)].collect().toSet
      assert(got === (0 until 5).map(v => (v.toDouble, "ok")).toSet)
    }
  }

  test("without the conf the rule is inert (nested loop, same rows)") {
    withFresh { s =>
      import s.implicits._
      setup(s)
      val df = s.sql(sql)
      assert(df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.as[(Double, String)].collect().toSet === expected)
    }
  }

  test("extra single-side conjunct: pushed down first, rewrite still correct") {
    withFresh { s =>
      import s.implicits._
      setup(s)
      s.conf.set("spark.graft.rangeJoinBinWidth", "10.0")
      // Catalyst pushes the right-side-only predicate below the join, which
      // leaves the pure containment shape — the rewrite then fires on it
      val df = s.sql("SELECT p.v, r.name FROM probe p JOIN ranges r " +
        "ON p.v >= r.lo AND p.v < r.hi AND r.name <> 'zz'")
      assert(df.as[(Double, String)].collect().toSet === expected)
    }
  }
}
