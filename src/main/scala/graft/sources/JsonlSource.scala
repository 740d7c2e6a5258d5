package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced JSONL (one JSON object per line) ingestion with
  * corrupt-record quarantine — the interchange format LLM training-data
  * pipelines actually exchange (one document per line, exported shard by
  * shard). The reference's ingest path is CSV-in-zip
  * (`pipelines/ais_pipeline.py:388-401`); JSONL is its contemporary twin and gets
  * the same contract the silver CSV ingest enforces: nothing unparsable
  * silently vanishes (`SilverIngest.clean`'s P5 discipline) — it lands in
  * a quarantine frame with the offending raw line intact.
  *
  * Spark-first shape: `spark.read.schema(...).json` in PERMISSIVE mode
  * with an explicit `_corrupt_record` column. The EXPLICIT schema is the
  * scale decision: schema inference reads the entire corpus once before
  * the real scan (2 passes over 100 TB), and a drifted field silently
  * widens types; a declared schema makes ingestion one pass and turns
  * drift into quarantined rows the DQ reconciliation can count. Malformed
  * lines parse to all-null rows carrying the raw text in the corrupt
  * column; well-formed lines missing a field get SQL NULL there (absent
  * field ≠ corrupt — the usual JSONL contract).
  *
  * Caveat baked into [[read]]: Spark cannot return ONLY the corrupt
  * column from a parse — referencing `_corrupt_record` alone throws by
  * design — so the split materializes the parsed frame as-is and filters
  * it twice; both branches are one scan each over the same files, no
  * driver-side state.
  */
object JsonlSource {

  val CorruptCol = "_graft_corrupt"

  /** Parsed frame: `schema`'s fields plus [[CorruptCol]] (null for clean
    * rows, the raw line for malformed ones).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** The export half of the interchange loop: write `df` as JSONL shards
    * with a bounded record count per file — the unit downstream training
    * jobs actually consume and retry. `maxRecordsPerFile` bounds shard size
    * WITHOUT a repartition (Spark's writer rolls files mid-task), so the
    * export adds no shuffle; pair with a keyed `repartition` upstream only
    * when shard-to-content affinity matters. Columns serialize in schema
    * order; absent-optional semantics mirror [[read]] (null fields are
    * written as JSON null, preserving round-trip fidelity with the
    * schema-enforced read).
    */
  def writeShards(df: DataFrame, path: String,
                  maxRecordsPerFile: Long = 100000L): Unit =
    df.write.option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite").json(path)

  /** The ingest contract: (clean, quarantine). Clean rows carry exactly
    * `schema`'s columns; quarantine rows carry the raw offending line
    * VERBATIM — not a schema-projected reconstruction, so fields outside
    * the declared schema, formatting, and key order all survive for
    * replay/audit. (The implementation reads lines as text and parses with
    * `from_json` precisely so the original line is always in hand; a
    * parsed-first read can only rebuild quarantine rows from the declared
    * columns, silently dropping everything else.) `requiredCols` promotes
    * missing-field rows (legal JSON, absent key) into quarantine too — for
    * pipelines where a document without an id or text is as useless as a
    * parse failure.
    */
  def readSplit(spark: SparkSession, path: String, schema: StructType,
                requiredCols: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    // blank/whitespace-only lines are formatting artifacts (trailing
    // newlines, shard-concat seams), not documents — skip them outright so
    // they never inflate quarantine counts the DQ reconciliation reads as
    // real data loss (the JSON line reader skips them silently too)
    val lines = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("raw_line"),
        from_json(col("value"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("p"))
    val missing = requiredCols.foldLeft(lit(false)) { (acc, c) =>
      acc || col(s"p.$c").isNull
    }
    val bad = col("p").isNull || col(s"p.$CorruptCol").isNotNull || missing
    val clean = lines.filter(!bad)
      .select(schema.fieldNames.map(f => col(s"p.$f").as(f)): _*)
    val quarantine = lines.filter(bad).select("raw_line")
    (clean, quarantine)
  }
}
