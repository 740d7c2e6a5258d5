package graft

import org.apache.spark.sql.functions._

import graft.ops.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  // id 3 has a null v (range rule can't confirm → violation);
  // id 4 is negative; id 5 carries a bad tag
  private def rows = Seq(
    (1L, Some(10.0), "ok"), (2L, Some(20.0), "ok"),
    (3L, None, "ok"), (4L, Some(-1.0), "ok"), (5L, Some(30.0), "bad")
  ).toDF("id", "v", "tag")

  private val rules = Seq(
    "v_non_negative" -> (col("v") >= 0.0),
    "tag_ok" -> (col("tag") === "ok"),
    "id_positive" -> (col("id") > 0L))

  test("audit: one row per rule with counts, rate, and min exemplar") {
    val got = DataQuality.audit(rows, "id", rules)
      .orderBy("rule")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), Option(r.get(4)))).toMap
    // null predicate counts as a violation; exemplar is the MIN violating id
    assert(got("v_non_negative") === ((5L, 2L, 0.4, Some(3L))))
    assert(got("tag_ok") === ((5L, 1L, 0.2, Some(5L))))
    // a rule that passes everywhere: zero violations, NULL exemplar
    assert(got("id_positive") === ((5L, 0L, 0.0, None)))
  }

  test("audit evaluates all rules in a single aggregate (one scan)") {
    val plan = DataQuality.audit(rows, "id", rules)
      .queryExecution.optimizedPlan.toString
    // exactly one Aggregate over the source — no per-rule re-scan or union
    assert(!plan.contains("Union"), "must not scan once per rule")
  }

  test("quarantine: per-rule bitmask bits and is_clean split") {
    val got = DataQuality.quarantine(rows, rules)
      .select("id", "violation_mask", "is_clean")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) === ((0L, true)) && got(2L) === ((0L, true)))
    assert(got(3L) === ((1L, false)), "bit 0 = rule 0 failed")
    assert(got(4L) === ((1L, false)))
    assert(got(5L) === ((2L, false)), "bit 1 = rule 1 failed")
  }

  test("kAnonymityAudit: combos below k flag risky on DISTINCT individuals, not rows") {
    // combo (a, d1): users {1,2,3} → size 3; (a, d2): user {1} ×3 rows →
    // size 1 (row count must NOT mask the re-identification risk);
    // (b, d1): users {1..5} → size 5, safe at k=5
    val df = Seq(
      ("a", "d1", 1L), ("a", "d1", 2L), ("a", "d1", 3L),
      ("a", "d2", 1L), ("a", "d2", 1L), ("a", "d2", 1L),
      ("b", "d1", 1L), ("b", "d1", 2L), ("b", "d1", 3L),
      ("b", "d1", 4L), ("b", "d1", 5L))
      .toDF("qa", "qb", "uid")
    val got = DataQuality.kAnonymityAudit(df, "uid", Seq("qa", "qb"), k = 5)
      .orderBy("qa", "qb")
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got === Seq(("a", "d1", 3L, true), ("a", "d2", 1L, true),
      ("b", "d1", 5L, false)),
      s"size counts distinct uids; risky means size < k: $got")
  }

  test("lDiversityAudit: a big-enough group still flags when everyone shares the sensitive value") {
    // (a, d1): 5 users, ONE balance band → k-anonymous at 5, l-risky at 3
    // (a, d2): 3 users, 3 bands → safe; (b, d1): 2 users, 2 bands → l-risky
    // duplicate (user, band) rows must not inflate either count
    val df = Seq(
      ("a", "d1", 1L, 9L), ("a", "d1", 2L, 9L), ("a", "d1", 3L, 9L),
      ("a", "d1", 4L, 9L), ("a", "d1", 5L, 9L), ("a", "d1", 5L, 9L),
      ("a", "d2", 1L, 1L), ("a", "d2", 2L, 2L), ("a", "d2", 3L, 3L),
      ("b", "d1", 1L, 1L), ("b", "d1", 2L, 2L))
      .toDF("qa", "qb", "uid", "band")
    val got = DataQuality.lDiversityAudit(df, "uid", Seq("qa", "qb"), "band", l = 3)
      .orderBy("qa", "qb")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(("a", "d1", 5L, 1L, true), ("a", "d2", 3L, 3L, false),
      ("b", "d1", 2L, 2L, true)),
      s"l counts distinct sensitive values per combo, risky means l < 3: $got")
  }

  test("psiDrift: matching slice reads ~0, shifted slice reads broken, no infinities") {
    import org.apache.spark.sql.functions.col
    // healthy slices dominate the corpus (the realistic monitoring ratio),
    // so the pooled reference IS their shape; the one degenerate slice
    // lives entirely in the top bin — classic broken-upstream drift
    val rows =
      Seq.tabulate(360)(i => ("same", (i % 10) * 10.0 + 5.0)) ++
      Seq.tabulate(40)(i => ("shifted", 95.0))
    val df = rows.toDF("slice_name", "v")
    val got = DataQuality.psiDrift(df, col("slice_name"), "v",
        lo = 0.0, hi = 100.0, nBins = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.values.forall(v => !v.isInfinite && !v.isNaN),
      "Laplace smoothing must keep every PSI finite")
    assert(got("shifted") > 0.25, s"degenerate slice must read broken: $got")
    assert(got("same") < 0.1, s"the majority shape must read stable: $got")
  }

  test("madOutliers: burst days flag against the entity's own median, MAD-0 history flags any deviation") {
    val rows = Seq(
      ("a", 10L), ("a", 10L), ("a", 10L), ("a", 100L), // constant + burst
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 5L) // spread, no outlier
    ).toDF("k", "v")
    val got = DataQuality.madOutliers(rows, "k", "v", k = 3.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    // a: med 10, MAD 0 — the burst is the only flagged day (strict >)
    assert(got(("a", 100L)) === ((10.0, 0.0, true)))
    assert(got(("a", 10L)) === ((10.0, 0.0, false)),
      "zero deviation never flags even at MAD 0")
    // b: med 3, MAD 1 → threshold 3; max deviation 2 stays inside
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(v => !got(("b", v))._3),
      s"spread-but-normal history must not flag: $got")
    assert(got(("b", 1L)) === ((3.0, 1.0, false)))
  }

  test("psiDrift: a slice equal to the whole input is exactly zero") {
    import org.apache.spark.sql.functions.lit
    val df = Seq.tabulate(50)(i => i % 100 * 1.0).toDF("v")
    val got = DataQuality.psiDrift(df, lit("all"), "v", 0.0, 100.0, 10)
      .collect()
    assert(got.length === 1 && got.head.getDouble(2) === 0.0,
      "p == q bin-for-bin must round to exactly 0")
  }

}
