package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{normalize_ts, stable_bucket}

/** Bronze→silver ingestion: the Spark re-expression of the reference's
  * chunked-pandas CSV pipeline (`pipelines/ais_pipeline.py:383-554`).
  *
  * The reference's manual machinery dissolves into Spark's task model:
  * 200k-row chunking → file-split partitions; groupby-partition writes →
  * `partitionBy`; retry/backoff → filesystem connector config. What remains
  * semantic — and is implemented here — is:
  *
  *   - case-insensitive fallback column resolution (`ais_pipeline.py:44-60,
  *     106-117,463-494`)
  *   - coercing timestamp normalization, drop-unparsable (`:495-508`)
  *   - lineage enrichment: source_file / ingested_at (`:500-507`)
  *   - partition-column derivation year/month/day (`:512-514`)
  *   - deterministic SHA-256 bucket id (`:517-518,532-535`)
  *   - hash-bucketed, hive-partitioned parquet sink, append or
  *     dynamic-overwrite (`:538-554`; modes `refresh_gold_tables.py:580-584`)
  *
  * Scale: the write shuffles once on (year, month, day, bucket_id) via
  * `repartition` so each task owns whole output files (no small-file storm
  * from 32 tasks × n partitions each); bucket count bounds file count per day.
  */
object SilverIngest {

  /** Case-insensitive candidate-list column resolution (P10). */
  def resolveColumn(columns: Seq[String], candidates: Seq[String]): Option[String] = {
    val byLower = columns.map(c => c.toLowerCase -> c).toMap
    candidates.iterator.map(_.toLowerCase).flatMap(byLower.get).nextOption()
  }

  /** The reference's fallback lists (`ais_pipeline.py:44-60`), abridged to the
    * shapes that occur in NOAA data + our fixtures.
    */
  val TsCandidates = Seq("BaseDateTime", "base_date_time", "basedatetime",
    "timestamp", "ts", "datetime", "date_time", "time")
  val UidCandidates = Seq("MMSI", "mmsi", "user_id", "uid", "vessel_id")

  /** Clean a stringly raw frame: resolve columns, normalize the timestamp,
    * drop unparsable/null-key rows, enrich lineage, derive partition columns,
    * assign the stable bucket. Output schema is the silver contract
    * (`docs/data_contracts.md:24-49`).
    */
  def clean(raw: DataFrame, numBuckets: Int, sourceUrl: String = ""): DataFrame = {
    val cols = raw.columns.toSeq
    val tsCol = resolveColumn(cols, TsCandidates)
      .getOrElse(sys.error(s"no timestamp column among $cols"))
    val uidCol = resolveColumn(cols, UidCandidates)
      .getOrElse(sys.error(s"no uid column among $cols"))
    raw
      .withColumn("event_ts", normalize_ts(col(tsCol).cast("string")))
      .filter(col(uidCol).isNotNull && col("event_ts").isNotNull) // P1 + P5
      .withColumn("mmsi", col(uidCol).cast("string"))
      .withColumn("source_file", input_file_name())               // P8 lineage
      .withColumn("source_url", lit(sourceUrl))
      .withColumn("ingested_at", current_timestamp())
      .withColumn("year", year(col("event_ts")))                  // P9
      .withColumn("month", month(col("event_ts")))
      .withColumn("day", dayofmonth(col("event_ts")))
      .withColumn("bucket_id", stable_bucket(col("mmsi"), numBuckets))
  }

  /** Hash-bucketed, hive-partitioned silver sink (K2/K6). `overwrite=true`
    * replaces only the partitions present in `df` (dynamic partition
    * overwrite — the Spark-native form of the reference's
    * drop-and-rebuild/append day lifecycle).
    */
  def writeSilver(df: DataFrame, outRoot: String, overwrite: Boolean = false): Unit = {
    df.repartition(col("year"), col("month"), col("day"), col("bucket_id"))
      .write
      .mode(if (overwrite) "overwrite" else "append")
      // per-write scope: never mutates the caller's session-wide overwrite
      // semantics for unrelated partitioned writes
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month", "day", "bucket_id")
      .option("compression", "snappy")
      .parquet(outRoot)
  }

  /** CSV → silver, end-to-end (S6 → K2). Spark reads .gz/.zst compressed CSV
    * natively; zip archives need a pre-extraction step (S4, driver-side IO).
    */
  def ingestCsv(spark: SparkSession, csvPath: String, outRoot: String,
                numBuckets: Int, sourceUrl: String = "",
                overwrite: Boolean = false): DataFrame = {
    val raw = spark.read.option("header", "true").csv(csvPath)
    val cleaned = clean(raw, numBuckets, sourceUrl)
    writeSilver(cleaned, outRoot, overwrite)
    spark.read.parquet(outRoot)
  }
}
