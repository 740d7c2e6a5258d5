package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the tokenizer-
  * construction step of an LLM data pipeline, distributed. Classic BPE greedily
  * merges the most frequent adjacent symbol pair, `numMerges` times.
  *
  * Scale shape: training runs over the WORD-FREQUENCY table, not the raw
  * corpus — the standard trick (one corpus pass builds (word, count); every
  * merge round then touches |vocab| rows, corpus size never matters again).
  * Each round is: one pair-count aggregate (map-side combined, weighted by
  * word count), a driver-side argmax of ONE row (the merge decision is
  * global and tiny), and a narrow per-word fold applying the merge.
  * `localCheckpoint` per round truncates lineage, same as
  * [[Dedup.dupClusters]] — plan depth stays O(1), not O(rounds).
  *
  * Determinism: argmax ties break on (left, right) lexicographically, and the
  * per-word merge fold is the standard greedy left-to-right non-overlapping
  * application, so retrained merges are bit-identical run to run.
  */
object Bpe {

  /** One learned merge: rank = order learned, (left, right) → left+right. */
  case class Merge(rank: Int, left: String, right: String, weight: Long)

  /** Greedy left-to-right application of ONE merge to a symbol array:
    * fold that replaces every non-overlapping (a, b) adjacency with a+b.
    */
  private def mergeFold(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Character seed: one symbol per character. */
  def seed(word: Column): Column = split(word, "")

  /** Learn `numMerges` merges from a (word, count) frequency table. Stops
    * early when no adjacent pair occurs at least `minPairCount` times.
    */
  def train(words: DataFrame, wordCol: String, countCol: String,
            numMerges: Int, minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    var toks = words
      .select(seed(col(wordCol)).as("__syms"), col(countCol).cast("long").as("__cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val best = toks
        .select(col("__cnt"), explode(when(size(col("__syms")) >= 2,
          transform(sequence(lit(1), size(col("__syms")) - 1), i =>
            struct(element_at(col("__syms"), i).as("l"),
              element_at(col("__syms"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("__cnt")).as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairCount) exhausted = true
      else {
        val (l, r, w) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += Merge(round, l, r, w)
        toks = toks
          .select(mergeFold(col("__syms"), l, r).as("__syms"), col("__cnt"))
          .localCheckpoint() // eager: apply the merge once, truncate lineage
        round += 1
      }
    }
    merges.toList
  }

  /** Segment words with a learned merge list: the apply path (tokenize new
    * text with the frozen tokenizer). Merges apply in rank order — same
    * greedy fold as training, chained; lineage is truncated every few merges
    * so expression depth stays bounded for long merge lists.
    */
  def segment(df: DataFrame, wordCol: String, merges: Seq[Merge],
              checkpointEvery: Int = 8): DataFrame = {
    var out = df.withColumn("__syms", seed(col(wordCol)))
    merges.sortBy(_.rank).zipWithIndex.foreach { case (m, i) =>
      out = out.withColumn("__syms", mergeFold(col("__syms"), m.left, m.right))
      if ((i + 1) % checkpointEvery == 0) out = out.localCheckpoint()
    }
    out.withColumnRenamed("__syms", "tokens")
  }
}
