package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based data-quality expectations — the generalization of the
  * reference's reconciliation check (`refresh_gold_tables.py:468-558`, which
  * compares one hardcoded pair of counts) into the Deequ/Great-Expectations
  * shape: a named list of row-level predicates, audited in bulk.
  *
  * Scale design: [[audit]] evaluates EVERY rule in a single aggregate pass —
  * per rule one conditional sum (violations) and one conditional min (the
  * deterministic exemplar row key). All of it partial-aggregates map-side,
  * so the fact table is scanned once, shuffles one row per partition, and
  * is never re-scanned per rule (the naive one-query-per-rule audit is R
  * scans). The per-rule rows are then unpivoted from the single result row
  * with a narrow explode — no shuffle.
  *
  * Null semantics: a rule whose predicate evaluates to NULL on a row (e.g.
  * `value >= 0` on a NULL value) counts as a VIOLATION — an expectation you
  * cannot confirm is not met. Mirror with `coalesce(pred, FALSE)` in SQL.
  */
object DataQuality {

  /** One row per rule: (rule, n_rows, n_violations, violation_rate,
    * first_bad_id) — `first_bad_id` is the minimum `keyCol` among violating
    * rows (NULL when the rule passes everywhere), a stable exemplar for
    * debugging that never depends on row order.
    */
  def audit(df: DataFrame, keyCol: String,
            rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs =
      count(lit(1)).as("n_rows") +:
        rules.zipWithIndex.flatMap { case ((_, pred), i) =>
          val ok = coalesce(pred, lit(false))
          Seq(sum(when(ok, 0L).otherwise(1L)).as(s"__v$i"),
            min(when(!ok, col(keyCol))).as(s"__k$i"))
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v$i").as("n_violations"),
        col(s"__k$i").as("first_bad_id"))
    }
    one.select(col("n_rows"), explode(array(entries: _*)).as("r"))
      .select(col("r.rule"), col("n_rows"), col("r.n_violations"),
        round(col("r.n_violations").cast("double") / col("n_rows"), 6)
          .as("violation_rate"),
        col("r.first_bad_id"))
  }

  /** Split `df` by the rules: every row annotated with a violation bitmask
    * (bit i set ⇔ rule i failed, same order as `rules`) and `is_clean`.
    * Callers filter `is_clean` for the pass-through set and `!is_clean` for
    * the quarantine side — one narrow codegen'd map, no shuffle, the same
    * audit-bitmask shape as the C4 quality filter ([[Curation]]).
    */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty && rules.size <= 63, "1..63 rules")
    val mask = rules.zipWithIndex.map { case ((_, pred), i) =>
      when(coalesce(pred, lit(false)), 0L).otherwise(lit(1L << i))
    }.reduce(_ + _)
    df.withColumn("violation_mask", mask)
      .withColumn("is_clean", col("violation_mask") === 0L)
  }
}
