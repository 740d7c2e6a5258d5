package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs ship in this environment); everything around it — the schema, the
  * batch shape, the partition-local iteration, the feature-vector contract —
  * is the real plumbing a decode kernel drops into. The batching mirrors
  * Arrow-batch processing (`mapInPandas`-style): the kernel receives a
  * `Seq[MediaRow]` of bounded size, never one row at a time and never a whole
  * partition materialized.
  *
  * Scale: decode is the classic CPU-heavy narrow stage — no shuffle, scales
  * with input splits; `repartition(n)` upstream controls decode parallelism
  * independently of file layout, and binary columns stay off-heap in Tungsten
  * until the kernel touches them.
  */
object Multimodal {

  /** A media object: opaque payload + the metadata a lakehouse would carry. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Extracted features: stub decode output with the real contract shape. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, histogram: Seq[Float])

  /** STUB decode kernel — deterministic fake standing in for an image/audio
    * decoder. Real implementation would parse the codec header; the fake
    * derives "dimensions" from the payload length and a 16-bin byte
    * histogram (which IS computed from the real bytes, so the data path
    * through the binary column is exercised end-to-end).
    */
  def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
    val n = m.bytes.length
    val hist = new Array[Float](16)
    var i = 0
    while (i < n) { hist((m.bytes(i) & 0xff) / 16) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
    MediaFeatures(m.media_id, m.kind, n, width = n % 640, height = (n * 7) % 480,
      histogram = hist.toSeq)
  }

  /** Partition-local batched feature extraction over a binary column.
    * `batchSize` bounds kernel working-set (the mapInPandas batch analog).
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(decodeStub))
  }

  /** Adapt the `documents` table into a media frame (text bytes as payload) —
    * the environment has no real image fixtures; the binary-column plumbing
    * is identical.
    */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").as("media_id"), lit("text").as("kind"),
      encode(col("text"), "UTF-8").as("bytes")).as[MediaRow]
  }

  /** One sampled frame: payload slice metadata + content digest. */
  case class Frame(media_id: Long, frame_idx: Int, n_bytes: Int, frame_sha: String)

  /** Frame sampling over a video-role binary column: the payload is treated
    * as fixed-`frameBytes` frame records and every `stride`-th frame is kept
    * (the standard 1-in-N video sampling prep). The kernel is deterministic
    * real byte work — slice + sha256 — standing where a codec's keyframe
    * extractor drops in; the Spark side (batched partition-local iteration,
    * per-row fanout bounded by frames/stride, never a whole-partition
    * materialization) is the production plumbing.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int,
                   batchSize: Int = 64): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { m =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      val nFrames = (m.bytes.length + frameBytes - 1) / frameBytes
      (0 until nFrames).filter(_ % stride == 0).map { j =>
        val from = j * frameBytes
        val until = math.min(from + frameBytes, m.bytes.length)
        val sha = digest.digest(java.util.Arrays.copyOfRange(m.bytes, from, until))
          .map("%02x".format(_)).mkString
        digest.reset()
        Frame(m.media_id, j, until - from, sha)
      }
    }))
  }

  /** Resize stub: keep every `factor`-th payload byte — a deterministic
    * stand-in for an image downscale kernel (binary in → smaller binary out,
    * the contract a real resizer satisfies). Batched like the decode path.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int,
                 batchSize: Int = 64): Dataset[MediaRow] = {
    require(factor > 0, "factor must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
      val out = new Array[Byte]((m.bytes.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = m.bytes(i * factor); i += 1 }
      MediaRow(m.media_id, m.kind, out)
    }))
  }

  /** Declared-query shape: deterministic feature projection (histogram
    * excluded — its float formatting is kernel-internal; the oracle checks
    * the metadata contract: sizes, stub dimensions, payload sha).
    */
  def mediaFeatures(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    extractFeatures(mediaFromDocuments(documents), batchSize)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"))
  }

  /** REAL container-header parsing over a binary column — unlike the decode
    * stub above, nothing here is faked: PNG/GIF/JPEG format + dimensions
    * come from the actual header bytes via the codegen'd
    * [[graft.expressions.ImageDims]] expression (validated against
    * JDK-ImageIO-encoded fixtures in `ExpressionsSpec`). This is the
    * pre-decode gate an image intake runs at full scan width: dimension /
    * aspect / format predicates route rows BEFORE the 10⁴×-costlier pixel
    * decode is scheduled; unparseable payloads surface as null format —
    * the quarantine predicate. Output: (idCol, format, width, height).
    */
  def imageDims(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val parts = split(graft.functions.image_dims(col(binCol)), " ")
    df.select(col(idCol), parts.as("__p"))
      .select(col(idCol), col("__p").getItem(0).as("format"),
        col("__p").getItem(1).cast("long").as("width"),
        col("__p").getItem(2).cast("long").as("height"))
  }

  /** Audio-role sibling of [[imageDims]]: PCM-WAV stream metadata from the
    * RIFF chunk walk ([[graft.expressions.WavMeta]], JDK-javax.sound
    * ground truth in `ExpressionsSpec`) — the pre-decode gate an audio
    * intake filters on (channels / sample rate / duration) before any
    * sample-level stage. Output: (idCol, channels, sample_rate,
    * bits, n_frames); unparseable payloads are all-null.
    */
  def wavMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val parts = split(graft.functions.wav_meta(col(binCol)), " ")
    df.select(col(idCol), parts.as("__p"))
      .select(col(idCol),
        col("__p").getItem(1).cast("long").as("channels"),
        col("__p").getItem(2).cast("long").as("sample_rate"),
        col("__p").getItem(3).cast("long").as("bits"),
        col("__p").getItem(4).cast("long").as("n_frames"))
  }

  /** Video-role member of the intake-gate trio ([[imageDims]] /
    * [[wavMeta]] / this): MP4/ISO-BMFF brand, track extent, and movie
    * timescale/duration from the raw box walk
    * ([[graft.expressions.Mp4Meta]]) — the pre-decode gate a video intake
    * filters on (brand / dimensions / duration) before any frame-decode
    * stage is scheduled. Output: (idCol, brand, width, height, timescale,
    * duration); unparseable payloads are all-null, audio-only containers
    * parse with 0×0 extent.
    */
  def mp4Meta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val parts = split(graft.functions.mp4_meta(col(binCol)), " ")
    df.select(col(idCol), parts.as("__p"))
      .select(col(idCol),
        col("__p").getItem(1).as("brand"),
        col("__p").getItem(2).cast("long").as("width"),
        col("__p").getItem(3).cast("long").as("height"),
        col("__p").getItem(4).cast("long").as("timescale"),
        col("__p").getItem(5).cast("long").as("duration"))
  }
}
