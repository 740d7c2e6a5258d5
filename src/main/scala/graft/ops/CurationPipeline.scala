package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.CacheScope

/** End-to-end corpus curation as ONE composition — the "a user could run
  * their whole pipeline here" entry point tying the curation stages the
  * engine ships individually (normalize → exact dedup → near-dup cluster
  * resolution → quality filter → benchmark decontamination → PII redaction)
  * into the published-pipeline order (C4/Gopher/Dolma all run this
  * sequence, in this order, for the same reasons: cheap drops first,
  * cluster-level decisions before row-level ones, transforms last).
  *
  * Survival semantics: every input doc comes back annotated with
  * `drop_stage` — the FIRST stage in precedence order that rejected it, or
  * null for survivors (`kept = drop_stage IS NULL`). One output frame means
  * ONE job: no per-stage actions, no intermediate materializations beyond
  * the shared normalized frame, and the funnel report ([[report]]) is a
  * groupBy over the same result. Keeping the rejected rows WITH their
  * reason (instead of filtering them away stage by stage) is what makes a
  * 100 TB curation run auditable — the mass removed at each gate is a
  * column aggregate, not a diff between runs.
  *
  * Scale shape: every signal is keyed on the doc id and joined back on it —
  * exact-dup flags (one fingerprint shuffle), near-dup canonicality (the
  * LSH band join + label propagation, candidates only), quality (narrow
  * map), decontamination (broadcast eval n-grams), redaction (narrow map).
  * Nothing rescans the corpus per stage; the normalized frame persists once
  * through the caller's [[CacheScope]].
  */
object CurationPipeline {

  /** Drop stages in precedence order (first match wins). */
  val Stages: Seq[String] = Seq("exact_dup", "near_dup", "quality", "contaminated")

  /** Annotate every doc with its curation outcome. Output: (doc_id,
    * clean_text — normalized and PII-redacted, drop_stage — null for
    * survivors, kept). Pass `evalSet` (any frame with `textCol`) to enable
    * the decontamination gate; without it the stage reports no drops.
    *
    * `candidatePairs` (columns `doc_a`, `doc_b`) injects a precomputed
    * near-dup candidate frame — the production shape, where the standing
    * dedup service (e.g. [[Dedup.incrementalLshPairs]] over its signature
    * store, or a cached full-corpus pair table) already owns pair
    * generation and the funnel must not re-shingle the corpus. The caller
    * guarantees the pairs were computed over the SAME text normalization;
    * per-doc MinHash signatures make a full-corpus pair table restricted to
    * this corpus's ids exactly equal to pairs computed on the subset.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             evalSet: Option[DataFrame] = None,
             minhashK: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3,
             candidatePairs: Option[DataFrame] = None,
             scope: CacheScope = CacheScope.global): DataFrame = {
    val normed = scope.persisted(docs.select(col(idCol).as("doc_id"),
      TextOps.normalizeText(col(textCol)).as("text")))
    val exact = Dedup.exact(normed, "doc_id", "text")
      .select(col("doc_id"), col("is_dup").as("__f_exact"))
    val pairs = candidatePairs.getOrElse(
      Dedup.minhashLshPairs(normed, "doc_id", "text",
        minhashK, rowsPerBand, shingleN, scope))
    val nearDup = Dedup.dupClusters(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), (!col("is_canonical")).as("__f_near"))
    val quality = Curation.qualityFilter(normed, "doc_id", "text")
      .select(col("doc_id"), (!col("keep")).as("__f_quality"))
    val contam = evalSet.map { ev =>
      Decontam.evalOverlap(normed, ev, "doc_id", textCol = "text", n = shingleN)
        .select(col("doc_id"), col("contaminated").as("__f_cont"))
    }
    val redacted = Curation.redactPii(normed, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("clean_text"))
    val joined = normed
      .join(exact, "doc_id")
      .join(nearDup, Seq("doc_id"), "left") // only docs in some pair appear
      .join(quality, "doc_id")
      .join(contam.getOrElse(normed.select(col("doc_id"),
        lit(false).as("__f_cont"))), Seq("doc_id"), "left")
      .join(redacted, "doc_id")
    val dropStage = when(col("__f_exact"), Stages(0))
      .when(coalesce(col("__f_near"), lit(false)), Stages(1))
      .when(col("__f_quality"), Stages(2))
      .when(coalesce(col("__f_cont"), lit(false)), Stages(3))
    joined.select(col("doc_id"), col("clean_text"),
      dropStage.as("drop_stage"), dropStage.isNull.as("kept"))
  }

  /** The funnel report over a [[curate]] result: rows per outcome —
    * `drop_stage` null row = survivors.
    */
  def report(curated: DataFrame): DataFrame =
    curated.groupBy("drop_stage").agg(count(lit(1)).as("n_docs"))
}
