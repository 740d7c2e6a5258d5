package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality reconciliation (A10): the Spark port of the reference's
  * `_run_data_checks` (`pipelines/refresh_gold_tables.py:468-558`) — after a
  * gold refresh, the hourly table's message counts must reconcile with the
  * filtered silver row count (`README.md:140`). Emitted as a tall
  * (check, value) frame so it can be asserted in tests, declared as a query,
  * or written to a monitoring sink unchanged.
  */
object QualityChecks {

  /** Reconcile an hourly gold table against its source events.
    * `sourceFiltered` must be the same filtered frame the rollup consumed
    * (the caller re-applies the rollup's predicate — mirroring how the
    * reference re-states the silver WHERE clause in its check queries,
    * `refresh_gold_tables.py:541-558`).
    */
  def reconcile(sourceFiltered: DataFrame, hourly: DataFrame): DataFrame = {
    val spark = hourly.sparkSession
    val gold = hourly.agg(
      count(lit(1)).as("gold_row_count"),
      coalesce(sum(col("message_count")), lit(0L)).as("sum_message_count"))
    val silver = sourceFiltered.agg(count(lit(1)).as("silver_filtered_count"))
    val joined = gold.crossJoin(silver)
      .withColumn("delta_messages",
        col("sum_message_count") - col("silver_filtered_count"))
    // tall shape, deterministic check order
    val checks = Seq("delta_messages", "gold_row_count", "silver_filtered_count",
      "sum_message_count")
    checks.map(c => joined.select(lit(c).as("check"), col(c).cast("long").as("value")))
      .reduce(_.unionAll(_))
  }

  /** Per-day row counts (the reference's `GROUP BY dt` sample check,
    * `refresh_gold_tables.py:519-527`).
    */
  def perDayCounts(hourly: DataFrame, dayCol: String = "dt"): DataFrame =
    hourly.groupBy(col(dayCol)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col(dayCol))

  /** Per-group z-score outlier flagging — the standard monitoring check for a
    * value column (is this reading anomalous for its group?). Group stats are
    * computed as EXACT integer sums of `unitScale`-scaled values (count, Σv,
    * Σv² in decimal — no double-association-order drift, so every engine
    * derives bit-identical mean/std), then broadcast back over the scan: one
    * tiny aggregate + a narrow map, no shuffle of the fact table at any
    * scale. Population std; groups with zero variance emit null z.
    */
  def zscoreOutliers(df: DataFrame, idCol: String, groupCol: String,
                     valueCol: String, threshold: Double,
                     unitScale: Int = 10000): DataFrame = {
    val units = round(col(valueCol) * unitScale).cast("decimal(20,0)")
    val stats = df.select(col(groupCol), units.as("u"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("u")).cast("double").as("s1"),
        sum(col("u") * col("u")).cast("double").as("s2"))
      .select(col(groupCol), (col("s1") / col("n")).as("mean_u"),
        (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
          .as("var_u"))
    df.join(broadcast(stats), groupCol)
      .select(col(idCol), col(groupCol),
        round(when(col("var_u") > 0,
          (units - col("mean_u")) / sqrt(col("var_u"))), 6).as("z"))
      .withColumn("is_outlier", abs(col("z")) > threshold)
  }
}
