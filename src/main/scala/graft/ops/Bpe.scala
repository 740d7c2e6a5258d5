package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.CacheScope

/** Byte-pair-encoding tokenizer TRAINING over a document corpus — the
  * missing piece between the engine's token statistics (vocab_topk,
  * pmi_bigrams) and an actual trainable tokenizer. Classic Sennrich-style
  * BPE: learn `nMerges` merge rules greedily by most-frequent adjacent
  * symbol pair.
  *
  * Scale shape (the part that matters at 100 TB): the corpus is touched
  * ONCE — a word-frequency shuffle whose map-side combine collapses each
  * partition's words before the exchange. Everything after runs on the
  * DISTINCT-WORD vocabulary, and Zipf's law makes that vocabulary small
  * (a 100 TB crawl's distinct-word table is GBs, not TBs). Two paths:
  *
  *   - [[trainLocal]] — the PRODUCTION path: collect the (word, freq)
  *     vocab to the driver once and run the merge loop in memory. Real
  *     tokenizers learn 30k+ merges; 30k driver-side array passes are
  *     milliseconds each, while 30k distributed jobs would be scheduler
  *     suicide. This is exactly how production BPE trainers work after
  *     the corpus-scale count.
  *   - [[train]] — the distributed iteration, for when the vocab must NOT
  *     be collected (synthetic corpora with unbounded distinct "words",
  *     or audit runs that want every step oracle-checked): per merge one
  *     map-side-combined pair-count shuffle, a driver top-1, and a NARROW
  *     per-word rewrite ([[graft.expressions.BpeMerge]], codegen'd), with
  *     periodic localCheckpoint bounding the linear lineage like
  *     [[Graph.pageRankMicro]].
  *
  * Determinism: integer frequencies; the winning pair breaks count ties on
  * (left, right) lexicographic order; the merge rewrite is the exact fold
  * the DuckDB `list_reduce` twin performs. End-of-word is the explicit
  * `</w>` sentinel symbol (Sennrich's convention), so learned merges
  * distinguish suffixes from mid-word runs.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** (word, freq) vocabulary of a text column: hygiene pass first
    * ([[TextOps.normalizeText]] — no control characters survive, so the
    * codepoint split below can't silently drop a `.`-unmatched char and the
    * Java-vs-RE2 `.`-excludes-what divergence never arises), then the
    * corpus-wide single-space tokenization ([[TextOps.tokens]]), empty
    * tokens dropped. The ONE corpus-scale shuffle of BPE training.
    */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(
        TextOps.normalizeText(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its codepoints plus the `</w>`
    * sentinel.
    */
  def initialSymbols(word: Column): Column =
    concat(regexp_extract_all(word, lit("."), lit(0)), array(lit(EndOfWord)))

  /** Frequency-weighted adjacent-pair counts of a (syms, freq) vocab:
    * (lhs, rhs, cnt). Map-side combine collapses to |distinct pairs|
    * before the exchange.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"), col("syms"),
        posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
          .as(Seq("i", "lhs")))
      .select(col("lhs"), element_at(col("syms"), col("i") + 2).as("rhs"),
        col("freq"))
      .groupBy("lhs", "rhs").agg(sum(col("freq")).as("cnt"))

  /** Learn `nMerges` merge rules, distributed per-iteration (see object doc
    * for when). Returns (step, lhs, rhs, cnt) — the ordered merge table
    * a tokenizer ships. Stops early if the vocabulary runs out of pairs.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            scope: CacheScope = CacheScope.global): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = scope.persisted(
      wordVocab(df, textCol)
        .select(initialSymbols(col("word")).as("syms"), col("freq")))
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += ((step, l, r, top(0).getLong(2)))
        val next = vocab.select(
          graft.functions.bpe_merge(col("syms"), lit(l), lit(r)).as("syms"),
          col("freq"))
        vocab = scope.persisted(
          if ((step + 1) % 4 == 0) next.localCheckpoint() else next)
        step += 1
      }
    }
    merges.toSeq.toDF("step", "lhs", "rhs", "cnt")
  }

  /** Driver-state bound for [[trainLocal]]: top-N distinct words kept by
    * frequency. 4M (word, freq) entries is a few hundred MB — comfortable
    * driver heap — while a Zipf tail beyond the top millions contributes
    * singleton frequencies that can never win a greedy merge vote against
    * the head's mass. Truncating the tail before the collect is standard
    * BPE practice (HF `tokenizers` and SentencePiece both expose exactly
    * this `vocab_size`/`max` pre-cut for the same reason).
    */
  val DefaultMaxVocab: Int = 1 << 22

  /** PRODUCTION path: one corpus-scale word count, then the whole merge
    * loop on the driver. Bit-identical to [[train]] (same greedy rule, same
    * tie-break, same fold) — property-tested — at 1e4× the iteration rate.
    * Driver state is bounded by `maxVocab`: the collect is a TakeOrdered of
    * the most frequent distinct words (ties broken on the word for
    * determinism), never the raw vocabulary.
    */
  def trainLocal(df: DataFrame, textCol: String, nMerges: Int,
                 maxVocab: Int = DefaultMaxVocab): DataFrame =
    trainLocalWithStats(df, textCol, nMerges, maxVocab)._1

  /** Exhaustion telemetry for [[trainLocalWithStats]]: `mergesLearned` of
    * the requested budget, and `exhausted` = the pair supply ran dry
    * BEFORE the budget (every word fully merged to a single symbol) — a
    * production caller alerts on it, because a tokenizer trained to
    * exhaustion on a too-small corpus has memorized the corpus, not
    * learned subword structure (its "vocabulary size" silently differs
    * from the requested one).
    */
  final case class TrainLocalStats(mergesLearned: Int, exhausted: Boolean)

  /** [[trainLocal]] plus [[TrainLocalStats]] — same loop, same output. */
  def trainLocalWithStats(df: DataFrame, textCol: String, nMerges: Int,
                          maxVocab: Int = DefaultMaxVocab): (DataFrame, TrainLocalStats) = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxVocab > 0, "maxVocab must be positive")
    val vocab0: Array[(Array[String], Long)] =
      wordVocab(df, textCol)
        .orderBy(col("freq").desc, col("word"))
        .limit(maxVocab)
        .collect().map { r =>
        val cps = r.getString(0).codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        (cps :+ EndOfWord, r.getLong(1))
      }
    var vocab = vocab0
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((step, l, r, c))
        vocab = vocab.map { case (syms, f) => (mergeLocal(syms, l, r), f) }
        step += 1
      }
    }
    (merges.toSeq.toDF("step", "lhs", "rhs", "cnt"),
      TrainLocalStats(step, exhausted))
  }

  /** DECODE — the inverse of [[encodeTokens]], closing the tokenizer
    * round-trip a serving stack needs (detokenize model output, audit that
    * an encoded corpus is losslessly recoverable). Tokens of a word
    * concatenate in `tj` order and shed the trailing `</w>` sentinel
    * (merges may have GLUED the sentinel into a larger token — "ab</w>" —
    * so the strip is an end-anchored suffix removal on the reassembled
    * word, not a token filter); words join in `wi` order with single
    * spaces. Output: (idCol, text_rt) = exactly the normalized text
    * encoding started from — BPE merges only ever regroup characters
    * within a word, so the round-trip is lossless by construction, and
    * the bpe_roundtrip oracle asserts it corpus-wide.
    *
    * Scale shape: two keyed aggregations (word assembly, then document
    * assembly — the second rides the first's partitioning on the shared
    * id key prefix only if bucketed, otherwise one exchange each) with
    * `sort_array(collect_list(struct(...)))` per group — per-group sort,
    * no window, no per-token shuffle row wider than (id, positions,
    * token).
    */
  def decodeTokens(tokens: DataFrame, idCol: String): DataFrame = {
    val word = array_join(
      transform(array_sort(collect_list(struct(col("tj"), col("token")))),
        s => s.getField("token")), "")
    val words = tokens.groupBy(col(idCol), col("wi"))
      .agg(regexp_replace(word, "</w>$", "").as("__w"))
    words.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("wi"), col("__w")))),
          s => s.getField("__w")), " ").as("text_rt"))
  }

  /** ENCODE a text column with a learned merge table: one narrow codegen'd
    * map over the corpus ([[graft.expressions.BpeApply]] — replay-order
    * exact, merge-table-size independent), exploded to one row per output
    * token: (id, wi, tj, token) where `wi` is the word's position in the
    * document and `tj` the token's position in the word. No shuffle at all —
    * encoding is embarrassingly parallel; the merge table rides in as a
    * broadcast-sized literal.
    */
  def encodeTokens(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val lhs = typedLit(merges.map(_._1))
    val rhs = typedLit(merges.map(_._2))
    df.select(col(idCol),
        posexplode(TextOps.tokens(TextOps.normalizeText(col(textCol))))
          .as(Seq("wi", "word")))
      .filter(length(col("word")) > 0)
      .select(col(idCol), col("wi"),
        posexplode(graft.functions.bpe_apply(initialSymbols(col("word")), lhs, rhs))
          .as(Seq("tj", "token")))
  }

  /** Deterministic token-id vocabulary of a trained tokenizer: base symbols
    * (every distinct initial symbol of the training corpus, binary-sorted —
    * Spark's UTF8String order, which is codepoint order and matches an
    * engine-independent UTF-8 collation) take ids 0..B-1; merge OUTPUTS take
    * the next ids in rank order, skipping strings already present (two
    * different merges, or a merge and a base symbol, can spell the same
    * string — one string, one id, first assignment wins, exactly GPT-2's
    * byte-alphabet-then-merges scheme). The base-symbol distinct is
    * vocab-sized (distinct codepoints + sentinel), so the driver-side
    * collect is bounded regardless of corpus size.
    */
  def vocabIds(df: DataFrame, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = wordVocab(df, textCol)
      .select(explode(initialSymbols(col("word"))).as("sym"))
      .distinct().orderBy("sym")
      .collect().map(_.getString(0))
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    base.foreach(seen += _)
    merges.foreach { case (l, r) => seen += (l + r) }
    seen.toSeq.zipWithIndex.map { case (s, i) => (s, i.toLong) }
      .toDF("sym", "id")
  }

  /** The same leftmost non-overlapping fold as [[graft.expressions.BpeMerge]]. */
  private[ops] def mergeLocal(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new Array[String](syms.length)
    var m = 0
    var i = 0
    while (i < syms.length) {
      if (m > 0 && out(m - 1) == l && syms(i) == r) out(m - 1) = l + r
      else { out(m) = syms(i); m += 1 }
      i += 1
    }
    if (m == syms.length) out else java.util.Arrays.copyOf(out, m)
  }
}
