package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up testdata generator (a `main`, dev instrument like
  * [[Verify]]/[[Bench]]): writes an "sf1-equivalent" table set — the three
  * tables the steep-scaler queries actually consume (`events`,
  * `documents`, `customer`) regenerated at `factor`× rows with the SAME
  * recipes the driver testdata follows (profiled from sf0.1: see each
  * builder), everything else copied through so `Bench` runs unchanged
  * against the output directory.
  *
  * Why regenerate instead of replicating rows 10×: id-shifted copies of
  * the SAME texts/names multiply near-duplicate and per-block pair volume
  * ~quadratically (10 copies of every document make every shingle 10×
  * hotter; 10 copies of every customer name put 10× the rows in each edit-
  * distance block), which would measure an input-distribution artifact,
  * not the engine's scaling. Fresh draws from the same distributions keep
  * duplicate/block density constant while row volume grows — the exact
  * contract a scale factor means.
  *
  * Determinism: fixed seeds on every `rand`, `xxhash64` for word choice,
  * and every `spark.range` PINS its partition count — `rand` seeds are
  * per-partition, so an unpinned range (which follows defaultParallelism,
  * i.e. the machine's core count) would draw different values per row on a
  * different box. Same args ⇒ same output bytes on any machine; no
  * wall-clock anywhere.
  *
  * Profile being matched (sf0.1, seed-42 driver data):
  *   - events: 100k rows, 1.5k users (both ∝ sf), ts uniform over
  *     2024-01-01..31, event_type uniform over 5, value ~ Exp(mean 50)
  *     (observed min 0 / max 560 / avg 49.9), props = {"k": 0..99}.
  *   - documents: 5k rows (∝ sf), text = 10..100 uniform words from the
  *     31-word vocab (avg 54.1), lang en-heavy (en .41, de/fr/es/zh
  *     ~.1475), source = src(doc_id % 20), n_chars = length(text).
  *   - customer: 15k rows (∝ sf), c_name = Customer#%09d (sequential —
  *     the fuzzy_pairs blocking key derives from it), nationkey 0..24,
  *     mktsegment 5 values, acctbal ~ U(-1000, 10000).
  */
object ScaleGen {

  private val Langs = Seq("en", "de", "fr", "es", "zh")
  private val EventTypes = Seq("view", "click", "signup", "purchase", "error")
  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Day0Micros = 1704067200000000L // 2024-01-01T00:00:00Z
  private val SpanMicros = 30L * 86400 * 1000000L

  /** Optional 4th arg `spanFactor`: stretch the events time window by this
    * factor as well. With spanFactor == factor the events-per-hour rate —
    * and so the per-cell-hour co-location DENSITY the co-movement pair
    * stage is quadratic in — stays constant while volume grows: the
    * faithful model of a real 10× corpus (more days/geography, not 10× the
    * vessels in the same month's water). spanFactor=1 (default) instead
    * multiplies density — the stress variant, useful to measure the dense
    * regime deliberately.
    */
  def main(args: Array[String]): Unit = {
    val (srcDir, outDir, factor, spanFactor) = args match {
      case Array(s, o, f) => (s, o, f.toLong, 1L)
      case Array(s, o, f, sp) => (s, o, f.toLong, sp.toLong)
      case _ =>
        System.err.println("usage: ScaleGen <srcSfDir> <outDir> <factor> [spanFactor]")
        sys.exit(2)
    }
    require(factor >= 1 && spanFactor >= 1, "factors must be >= 1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (nEvents, nDocs, nCust) = generate(spark, srcDir, outDir, factor, spanFactor)
    // scalastyle:off println — stdout is the tool's receipt
    println(s"""SCALEGEN {"out":"$outDir","factor":$factor,"span_factor":$spanFactor,"events":$nEvents,"documents":$nDocs,"customers":$nCust}""")
    spark.stop()
  }

  /** The generation recipe, callable on ANY session (the digest spec runs it
    * on the shared test session — [[main]] above owns session lifecycle).
    * Determinism contract: nothing here depends on the session's core count
    * or `spark.sql.shuffle.partitions` — every `spark.range` pins its
    * partition count (rand seeds are per-partition), the vocabulary is
    * collected SORTED, and the copy-through rewrites source bytes unchanged.
    * Same (srcDir, factor, spanFactor) ⇒ same rows on any machine —
    * asserted by ScaleGenDigestSpec against recorded row digests, which is
    * what makes the scaling legs reproducible evidence rather than same-box
    * artifacts.
    */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
               factor: Long, spanFactor: Long): (Long, Long, Long) = {

    // copy-through: same bytes, so the calibration probe (q1_agg over
    // lineitem) and gold warm-up see a known workload
    Seq("region", "nation", "supplier", "part", "orders", "lineitem",
        "embeddings").foreach { t =>
      engine.Tables.load(spark, srcDir, t)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

    // events
    val srcEv = engine.Tables.events(spark, srcDir)
    val nEvents = srcEv.count() * factor
    val nUsers = srcEv.select("user_id").distinct().count() * factor
    spark.range(0L, nEvents, 1L, 32).select(
        col("id").as("event_id"),
        timestamp_micros(lit(Day0Micros) +
          (rand(101) * lit((SpanMicros * spanFactor).toDouble)).cast("long"))
          .as("ts"),
        (rand(102) * nUsers).cast("long").as("user_id"),
        element_at(typedLit(EventTypes),
          (rand(103) * 5).cast("int") + 1).as("event_type"),
        // inverse-CDF exponential, mean 50 (matches the observed profile)
        (lit(-50.0) * log(lit(1.0) - rand(104))).as("value"),
        concat(lit("{\"k\": "), (rand(105) * 100).cast("int"), lit("}"))
          .as("props"))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // documents: draw from the SOURCE corpus's own vocabulary so shingle /
    // token distributions extend rather than shift
    val vocab = engine.Tables.documents(spark, srcDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .orderBy("w").collect().map(_.getString(0)).toSeq
    val nDocs = engine.Tables.documents(spark, srcDir).count() * factor
    val nWords = (rand(201) * 91).cast("int") + 10 // U[10,100]
    val langPick = when(rand(202) < 0.41, lit("en"))
      .otherwise(element_at(typedLit(Langs.drop(1)),
        (rand(203) * 4).cast("int") + 1))
    spark.range(0L, nDocs, 1L, 32).select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), nWords), i =>
          element_at(typedLit(vocab),
            (pmod(xxhash64(col("id"), i), lit(vocab.size)) + 1).cast("int"))),
          " ").as("text"),
        langPick.as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // customer: sequential names — the fuzzy blocking key structure
    // (prefix-of-name blocks of exactly 100) is a property of the FORMAT,
    // so extending the sequence preserves block density exactly
    val nCust = engine.Tables.customer(spark, srcDir).count() * factor
    spark.range(0L, nCust, 1L, 8).select(
        col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        (rand(301) * 25).cast("int").as("c_nationkey"),
        round(rand(302) * 11000.0 - 1000.0, 2).as("c_acctbal"),
        element_at(typedLit(Segments), (rand(303) * 5).cast("int") + 1)
          .as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    (nEvents, nDocs, nCust)
  }
}
