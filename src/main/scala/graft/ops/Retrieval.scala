package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-stack composition: rank fusion across heterogeneous scorers and
  * the evaluation harness that keeps an ANN index honest against the exact
  * baseline. The reference serves single-signal queries (cohort filters,
  * top-k by one score — `apps/export_tracks_to_explore.py:57-68`,
  * `apps/track_explorer.py:221-245`); a training-data/RAG pipeline runs the
  * same corpus through BOTH a lexical scorer (BM25) and an embedding scorer
  * and has to (a) combine the rankings and (b) measure how much the
  * approximate index loses versus brute force. Both are tiny keyed
  * DataFrame jobs over the top-k frames the heavy legs already produce —
  * fusion/eval never touch the corpus again.
  */
object Retrieval {

  /** Dense rank positions (1-based) for a top-k result frame, ordering by
    * `scoreCol` descending with `idCol` breaking exact ties (total order).
    *
    * Meant for ALREADY-REDUCED top-k frames (k rows, driver-bounded): the
    * unpartitioned window is a single-task sort over k rows, which is the
    * right plan — the corpus-scale work happened in the leg that produced
    * the frame, not here.
    */
  def rankByScore(topk: DataFrame, idCol: String, scoreCol: String,
                  rankCol: String): DataFrame =
    topk.select(col(idCol),
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol)))
        .cast("long").as(rankCol))

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher's rrf) of ranked legs:
    * `score(d) = Σ_legs 1/(c + rank_leg(d))`, docs absent from a leg
    * contribute 0 for it. Input legs are `(frame, rankCol)` pairs where the
    * frame holds `idCol` + a 1-based rank column (see [[rankByScore]]).
    * Output: `idCol`, each leg's rank (null when the doc missed that leg),
    * `rrf` rounded 6, best `k` by raw fused score (id breaks ties).
    *
    * Determinism across engines: each term is one IEEE division of exact
    * small integers and the fused score is a FIXED-ORDER chain of those
    * terms (never an unordered SUM over rows), so the raw doubles are
    * bit-identical and safe to rank on.
    *
    * Scale: legs are top-k frames, so the full-outer joins and the final
    * sort touch O(legs·k) rows — independent of corpus size by design.
    */
  def rrfFuse(legs: Seq[(DataFrame, String)], idCol: String, k: Int,
              c: Int = 60): DataFrame = {
    require(legs.size >= 2, "rrf needs at least two rankings")
    require(legs.map(_._2).distinct.size == legs.size,
      "each leg needs a distinct rank column")
    val joined = legs.map(_._1).reduce(_.join(_, Seq(idCol), "full_outer"))
    val fused = legs.map { case (_, rc) =>
      coalesce(lit(1.0) / (lit(c.toDouble) + col(rc)), lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("__rrf", fused)
      .orderBy(col("__rrf").desc, col(idCol))
      .limit(k)
      .select(col(idCol) +: legs.map { case (_, rc) => col(rc) } :+
        round(col("__rrf"), 6).as("rrf"): _*)
  }

  /** Per-query quality of an ANN result against the exact top-k baseline:
    * `recall` = |ANN∩exact| / k, `rr` = reciprocal rank (1/position) of the
    * TRUE nearest neighbor inside the ANN list (0.0 when the index missed
    * it — averaging `rr` over queries is MRR). Both frames carry
    * `(qCol, nCol, rnCol)` rows with `rnCol` 1-based, ≤ k per query (the
    * shape `Ivf.search` / `Similarity.cosineTopK` / `Pq.adcTopK` emit).
    *
    * The join is keyed on (query, neighbor) — O(queries·k) rows regardless
    * of corpus size; recall/rr are exact rationals of small integers, so
    * cross-engine parity is trivial. This is the gate a 100 TB corpus runs
    * per index rebuild: recall regression = rebuild misconfigured (nProbe,
    * plane count, codebook drift) BEFORE queries go to production.
    */
  def rankEval(ann: DataFrame, exact: DataFrame, qCol: String, nCol: String,
               rnCol: String, k: Int): DataFrame = {
    val hits = exact.select(col(qCol), col(nCol))
      .join(ann.select(col(qCol), col(nCol)), Seq(qCol, nCol))
      .groupBy(qCol).agg(count(lit(1)).as("__hits"))
    val top1 = exact.filter(col(rnCol) === 1).select(col(qCol), col(nCol))
    val rr = top1.join(ann, Seq(qCol, nCol), "left")
      .select(col(qCol),
        coalesce(lit(1.0) / col(rnCol), lit(0.0)).as("rr"))
    exact.select(col(qCol)).distinct()
      .join(hits, Seq(qCol), "left")
      .join(rr, Seq(qCol), "left")
      .select(col(qCol),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / k, 6)
          .as("recall"),
        round(coalesce(col("rr"), lit(0.0)), 6).as("rr"))
  }
}
