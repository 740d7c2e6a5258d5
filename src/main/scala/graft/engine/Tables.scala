package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata layout (`TESTDATA.md`): one parquet
  * file per table under `sfDir`. Mirrors the reference's silver/gold
  * table access (`refresh_gold_tables.py:80-143` reads hive tables; we
  * read partition-discovered parquet — Catalyst prunes identically).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (round ≤6 testdata)
    * and TIMESTAMP(MICROS) (round 7+ regeneration); adapt to whatever the
    * footer says and always emit a session-zone `timestamp` so downstream
    * `unix_millis`/`date_trunc` see identical wall times either way.
    *
    *  - NANOS surfaces as `LongType` when the session sets
    *    `spark.sql.legacy.parquet.nanosAsLong` (done at session build by
    *    Bench/Verify/specs — never mutated here): convert with integer `div`
    *    (a double roundtrip would lose precision above 2^53 ns).
    *  - MICROS without a timezone surfaces as `TIMESTAMP_NTZ`: cast to LTZ,
    *    which interprets the wall time in the session zone (UTC).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
