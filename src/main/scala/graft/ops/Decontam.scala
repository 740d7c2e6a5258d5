package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose n-grams overlap an
  * evaluation set — the standard train/test contamination check an LLM data
  * pipeline runs before every training mix (GPT-3 appendix C–style 13-gram
  * overlap; the declared query uses 3-token shingles to match the short
  * synthetic docs).
  *
  * Scale design: the eval side of the join is the DISTINCT n-gram set of the
  * benchmark suite — thousands of docs, a few million n-grams — so it is
  * explicitly `broadcast()`. The 100 TB training corpus is then scanned ONCE:
  * explode shingles (narrow), broadcast-hash-join against the eval set (no
  * shuffle of the corpus), and one map-side-combinable groupBy per doc. Total
  * cost = one corpus shuffle keyed on doc_id, independent of eval-set size.
  */
object Decontam {

  /** Per-training-doc overlap with the eval set's n-grams.
    *
    * Output: (doc_id, n_sh, hits, overlap_frac, contaminated) — `n_sh` =
    * distinct n-grams of the doc, `hits` = how many of those appear anywhere
    * in the eval set, `contaminated` = hits ≥ `minHits`. Docs with fewer than
    * `n` tokens have zero shingles and report (0, 0, 0.0, false) — they stay
    * in the output (explode_outer) so the result is a total annotation of the
    * training corpus, not a filter.
    */
  def evalOverlap(train: DataFrame, eval: DataFrame, idCol: String,
                  textCol: String, n: Int = 3, minHits: Int = 1): DataFrame = {
    val evalNg = broadcast(
      eval.select(explode(Dedup.shingles(col(textCol), n)).as("ng")).distinct())
    val rows = Dedup.fanout(train)
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode_outer(Dedup.shinglesOfTokens(col("toks"), n)).as("shingle"))
    rows.join(evalNg, rows("shingle") === evalNg("ng"), "left")
      .groupBy("doc_id")
      .agg(count(col("shingle")).as("n_sh"), count(col("ng")).as("hits"))
      .select(col("doc_id"), col("n_sh"), col("hits"),
        round(when(col("n_sh") > 0,
          col("hits").cast("double") / col("n_sh")).otherwise(0.0), 6)
          .as("overlap_frac"),
        (col("hits") >= minHits).as("contaminated"))
  }
}
