package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{BitInterleave, BpeApply, BpeMerge, DeflateSize, EntityDecode, EntropyTerms, GeoCell, ImageDims, MinHashSig, MinHashText, Mp4Meta, RollingKgramHash, ShingleHashes, StableHashBucket, VecDot, WavMeta, WinnowMin}

/** SQL surface for the engine's native Catalyst expressions: registers
  * `geo_cell`, `stable_bucket`, `vec_dot`, and `rolling_kgrams` as SQL
  * functions so `spark.sql("SELECT geo_cell(lat, lon, 9) ...")` works
  * anywhere the DataFrame facade ([[graft.functions]]) does.
  *
  * Two entry points, same builders:
  *   - cluster-wide: `--conf spark.sql.extensions=graft.engine.GraftExtensions`
  *     (the standard extensions hook — applied to every new session).
  *   - per-session: [[GraftExtensions.register]] on a live session (tests,
  *     notebooks).
  *
  * The expressions stay codegen'd through the SQL path — registration hands
  * Catalyst the same Expression nodes the column functions build, so plans
  * are identical whichever API declared them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // optimizer surface: range-containment joins become binned equi-joins
    // whenever spark.graft.rangeJoinBinWidth is set (see RangeJoinRewrite)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    // the 11-arg constructor is the only non-deprecated usage-carrying one
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** (identifier, info, builder) triples for every engine SQL function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("geo_cell"),
      info("geo_cell", "geo_cell(lat, lon, res) - hex cell address (15 hex chars)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "geo_cell(lat, lon, res) takes 3 arguments")
        GeoCell(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("stable_bucket"),
      info("stable_bucket", "stable_bucket(str, n) - sha256-based bucket in [0, n)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "stable_bucket(str, n) takes 2 arguments")
        StableHashBucket(args(0), args(1))
      }),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - strict in-order dot product of double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes 2 arguments")
        VecDot(args(0), args(1))
      }),
    (FunctionIdentifier("rolling_kgrams"),
      info("rolling_kgrams", "rolling_kgrams(text, k) - mod-p polynomial hash per k-gram"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "rolling_kgrams(text, k) takes 2 arguments")
        RollingKgramHash(args(0), args(1))
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(arr, k) - k-slot integer MinHash of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(arr, k) takes 2 arguments")
        MinHashSig(args(0), args(1))
      }),
    (FunctionIdentifier("minhash_text"),
      info("minhash_text", "minhash_text(text, n, k) - one-pass n-gram MinHash of a string"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_text(text, n, k) takes 3 arguments")
        MinHashText(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("bpe_apply"),
      info("bpe_apply", "bpe_apply(syms, lhs_arr, rhs_arr) - full BPE encode against a literal merge table"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bpe_apply(syms, lhs_arr, rhs_arr) takes 3 arguments")
        BpeApply(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("bpe_merge"),
      info("bpe_merge", "bpe_merge(syms, left, right) - one leftmost non-overlapping BPE merge"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bpe_merge(syms, left, right) takes 3 arguments")
        BpeMerge(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n) - distinct n-token shingle hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes(text, n) takes 2 arguments")
        ShingleHashes(args(0), args(1))
      }),
    (FunctionIdentifier("deflate_size"),
      info("deflate_size", "deflate_size(str) - zlib-compressed byte size (level 6)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deflate_size(str) takes 1 argument")
        DeflateSize(args(0))
      }),
    (FunctionIdentifier("z_order"),
      info("z_order", "z_order(x, y) - Morton bit-interleave of two keys (clustering sort key)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "z_order(x, y) takes 2 arguments")
        BitInterleave(args(0), args(1))
      }),
    (FunctionIdentifier("image_dims"),
      info("image_dims", "image_dims(bin) - 'fmt w h' from PNG/GIF/JPEG header bytes, null if unparseable"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "image_dims(bin) takes 1 argument")
        ImageDims(args(0))
      }),
    (FunctionIdentifier("wav_meta"),
      info("wav_meta", "wav_meta(bin) - 'wav ch rate bits frames' from RIFF bytes, null if unparseable"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "wav_meta(bin) takes 1 argument")
        WavMeta(args(0))
      }),
    (FunctionIdentifier("mp4_meta"),
      info("mp4_meta", "mp4_meta(bin) - 'mp4 brand w h timescale duration' from ISO-BMFF bytes, null if unparseable"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "mp4_meta(bin) takes 1 argument")
        Mp4Meta(args(0))
      }),
    (FunctionIdentifier("entropy_terms"),
      info("entropy_terms", "entropy_terms(str) - struct(n_chars, t_sum): code-point count + micro-unit entropy sum"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "entropy_terms(str) takes 1 argument")
        EntropyTerms(args(0))
      }),
    (FunctionIdentifier("entity_decode"),
      info("entity_decode", "entity_decode(str) - HTML named + printable numeric character references, one single-decode pass"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "entity_decode(str) takes 1 argument")
        EntityDecode(args(0))
      }),
    (FunctionIdentifier("winnow_min"),
      info("winnow_min", "winnow_min(arr, w) - distinct sliding-window minima of a long array (winnowing kernel)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "winnow_min(arr, w) takes 2 arguments")
        WinnowMin(args(0), args(1))
      }))

  /** Register every engine function on a live session (the per-session form
    * of the extensions hook).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      org.apache.spark.sql.graftbridge.bridge.registerFunction(spark, id, inf, builder)
    }
}
