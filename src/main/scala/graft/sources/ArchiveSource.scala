package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Archive-aware CSV source: the Spark re-expression of the reference's
  * zip-member extraction (S4, `pipelines/ais_pipeline.py:399-417`) and zstd
  * stream decompression (S5, `:418-432`).
  *
  * NOAA serves daily AIS archives as `.zip` (one or more `.csv` members) or
  * `.csv.zst`. Spark's text/csv readers can't open zip members, and this
  * environment lacks the native Hadoop zstd codec — so archives are decoded
  * with JVM streams (java.util.zip; zstd-jni, which ships with Spark for
  * parquet/shuffle compression).
  *
  * Scale: one task per archive (a zip member is not splittable, so file
  * granularity is the right granularity). The `binaryFile` source is used for
  * LISTING only — the `content` column is never selected, so Spark prunes it
  * and no archive bytes are read during planning. Each task opens its
  * archive as a filesystem stream and decodes lazily: at any moment the task
  * holds one decompressor's buffers and one line, never a whole member or
  * archive. A multi-GB daily therefore streams through a constant-memory
  * window. Parallelism = number of daily archives, matching the reference's
  * per-file loop — repartition after parsing if a day needs wider fan-out.
  */
object ArchiveSource {

  /** One extracted text line, with archive + member lineage (the reference's
    * `source_file` / `source_member` contract, `docs/data_contracts.md:32-35`).
    */
  case class ArchiveLine(path: String, member: String, line: String)

  /** Member name of the marker row a permissive read emits for a corrupt
    * archive (`line` carries the decode error). Filter on it for the
    * corruption report; real zip members can never collide (they end in
    * `.csv` by the walk filter).
    */
  val CorruptMember = "_corrupt"

  /** Permissive-decode guard: on a decode failure (truncated deflate
    * stream, bad zip entry, zstd frame error) the archive's iteration ends
    * with ONE [[CorruptMember]] marker carrying the error — lines already
    * decoded are kept, the task survives, and the corruption is AUDITABLE
    * (silent truncation would read as "decoded everything"). Garbage that
    * yields no decodable entry at all produces zero rows and no marker —
    * java.util.zip scans past unrecognizable bytes without erroring.
    */
  private[sources] def truncateOnCorruption(it: Iterator[(String, String)],
                                            close: () => Unit): Iterator[(String, String)] =
    new Iterator[(String, String)] {
      private var pendingError: String = null
      private var done = false
      private def trip(e: Throwable): Boolean = {
        pendingError = s"${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(200)
        try close() catch { case _: Throwable => () }
        true
      }
      override def hasNext: Boolean =
        if (done) false
        else if (pendingError != null) true
        else {
          // IllegalArgumentException: ZipInputStream's entry-name decode
          // (MALFORMED) — a corrupt central-directory name, not a bug here
          val h =
            try it.hasNext
            catch {
              case e: java.io.IOException => trip(e)
              case e: IllegalArgumentException => trip(e)
            }
          if (!h) done = true
          h
        }
      override def next(): (String, String) =
        if (pendingError != null) {
          val m = (CorruptMember, pendingError)
          pendingError = null; done = true
          m
        } else {
          try it.next()
          catch {
            case e: java.io.IOException => trip(e); next()
            case e: IllegalArgumentException => trip(e); next()
          }
        }
    }

  private def lines(in: InputStream): Iterator[String] = {
    val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    Iterator.continually(r.readLine()).takeWhile(_ != null)
  }

  /** Runs `close` exactly once, when the wrapped iterator is exhausted.
    * (Limit-truncated consumers that abandon the iterator early are covered
    * by the task-completion hook in [[archiveLines]].)
    */
  private def closeOnExhaust[A](it: Iterator[A], close: () => Unit): Iterator[A] =
    new Iterator[A] {
      private var closed = false
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; close() }
        h
      }
      override def next(): A = it.next()
    }

  /** Lazily decode one archive into (member, line) pairs by extension. `open`
    * is invoked once; the returned iterator pulls from the stream on demand —
    * zip members are walked entry-by-entry (the shared `ZipInputStream`
    * advances only after a member's lines are consumed) and nothing beyond
    * the decompressor's fixed read-ahead buffers is ever materialized.
    */
  def decodeStream(path: String, open: () => InputStream): Iterator[(String, String)] = {
    val lower = path.toLowerCase
    if (lower.endsWith(".zip")) {
      val zin = new ZipInputStream(open())
      val it = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .filter(e => !e.isDirectory && e.getName.toLowerCase.endsWith(".csv"))
        .flatMap { e =>
          val name = e.getName // capture: entry mutates as the walk advances
          lines(new FilterCloseInputStream(zin)).map(l => (name, l))
        }
      closeOnExhaust(it, () => zin.close())
    } else if (lower.endsWith(".zst")) {
      val member = path.split('/').last.stripSuffix(".zst")
      val in = new com.github.luben.zstd.ZstdInputStream(open())
      closeOnExhaust(lines(in).map(l => (member, l)), () => in.close())
    } else {
      val member = path.split('/').last
      val in = open()
      closeOnExhaust(lines(in).map(l => (member, l)), () => in.close())
    }
  }

  /** In-memory convenience overload (tests, pre-fetched buffers). */
  def decode(path: String, content: Array[Byte]): Iterator[(String, String)] =
    decodeStream(path, () => new ByteArrayInputStream(content))

  /** All CSV lines of every archive under `glob`, with lineage columns.
    * Listing happens on the driver (path column only — no bytes); each task
    * streams its archives straight from the filesystem. Streams left open by
    * early-terminating consumers (e.g. `LIMIT 1` header probes) are closed by
    * a task-completion hook.
    *
    * `permissive = true` is the 100-TB landing contract: ONE truncated
    * archive in a year of dailies must cost its own tail, not the job —
    * decoded lines are kept and the archive ends with a [[CorruptMember]]
    * marker row (count them for the corruption report). Default stays
    * strict: a decode failure fails the task, Spark retries, the job
    * surfaces the bad file.
    */
  def archiveLines(spark: SparkSession, glob: String,
                   permissive: Boolean = false): Dataset[ArchiveLine] = {
    import spark.implicits._
    // Hadoop Configuration is not serializable: ship its entries and rebuild
    val confKV = spark.sparkContext.hadoopConfiguration.asScala
      .map(e => (e.getKey, e.getValue)).toArray
    spark.read.format("binaryFile").load(glob)
      .select(col("path"))
      .as[String]
      .mapPartitions { paths =>
        val conf = new Configuration(false)
        confKV.foreach { case (k, v) => conf.set(k, v) }
        val tc = TaskContext.get()
        paths.flatMap { p =>
          val hp = new HadoopPath(p)
          val open = () => {
            val s = hp.getFileSystem(conf).open(hp)
            if (tc != null) tc.addTaskCompletionListener[Unit](_ => s.close())
            s: InputStream
          }
          val decoded = decodeStream(p, open)
          // on trip the underlying stream is closed by the task-completion
          // hook registered in `open` (same lifecycle as early termination)
          val guarded =
            if (permissive) truncateOnCorruption(decoded, () => ())
            else decoded
          guarded.map { case (m, l) => ArchiveLine(p, m, l) }
        }
      }
  }

  /** Archives → stringly CSV DataFrame (header resolved per the usual CSV
    * rules), ready for [[graft.ops.SilverIngest.clean]]. Lineage travels in
    * `_archive_path` / `_archive_member`. Assumes members share one schema
    * (true for NOAA dailies; the reference makes the same assumption).
    *
    * The header probe is a LIMIT-1 job that, thanks to the lazy decode,
    * reads only the first archive's first line — not a full decode pass.
    * Pass `schema` to skip the name-resolution micro-job entirely.
    */
  def csv(spark: SparkSession, glob: String,
          schema: Option[StructType] = None): DataFrame = {
    import spark.implicits._
    val raw = archiveLines(spark, glob)
    val header = raw.head().line
    // column names via the real CSV header rules (quoting etc.), no inference:
    // a header-only read yields the schema and zero rows
    val resolved = schema.getOrElse(
      spark.read.option("header", "true")
        .csv(spark.createDataset(Seq(header))).schema)
    // from_csv per line keeps (path, member) provenance on every row — the
    // reference's source_file/source_member contract (data_contracts.md:32-35)
    raw.filter(r => r.line != header)
      .select(
        from_csv(col("line"), resolved, Map.empty[String, String]).as("rec"),
        col("path").as("_archive_path"),
        col("member").as("_archive_member"))
      .select(col("rec.*"), col("_archive_path"), col("_archive_member"))
  }
}

/** Prevents member readers from closing the shared ZipInputStream. */
private class FilterCloseInputStream(in: InputStream) extends java.io.FilterInputStream(in) {
  override def close(): Unit = () // keep underlying zip stream open
}
