package graft.sources

import java.io.{BufferedReader, ByteArrayInputStream, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Archive-aware CSV source: the Spark re-expression of the reference's
  * zip-member extraction (S4, `pipelines/ais_pipeline.py:399-417`) and zstd
  * stream decompression (S5, `:418-432`).
  *
  * NOAA serves daily AIS archives as `.zip` (one or more `.csv` members) or
  * `.csv.zst`. Spark's text/csv readers can't open zip members, and this
  * environment lacks the native Hadoop zstd codec — so archives are read via
  * the `binaryFile` source and decoded with JVM streams (java.util.zip;
  * zstd-jni, which ships with Spark for parquet/shuffle compression).
  *
  * Scale: one task per archive (binaryFile splits at file granularity — the
  * right granularity: a zip member is not splittable). Decode streams; only
  * the produced lines are materialized. Parallelism = number of daily
  * archives, which matches the reference's per-file loop — repartition after
  * parsing if a day's CSV needs wider fan-out.
  */
object ArchiveSource {

  /** One extracted text line, with archive + member lineage (the reference's
    * `source_file` / `source_member` contract, `docs/data_contracts.md:32-35`).
    */
  case class ArchiveLine(path: String, member: String, line: String)

  private def lines(in: InputStream): Iterator[String] = {
    val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    Iterator.continually(r.readLine()).takeWhile(_ != null)
  }

  /** Decode one archive's bytes into (member, line) pairs by extension. */
  def decode(path: String, content: Array[Byte]): Iterator[(String, String)] = {
    val lower = path.toLowerCase
    if (lower.endsWith(".zip")) {
      val zin = new ZipInputStream(new ByteArrayInputStream(content))
      // materialize per-member to keep a simple iterator contract; zip members
      // must be consumed before advancing the shared stream anyway
      val out = ArrayBuffer.empty[(String, String)]
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && e.getName.toLowerCase.endsWith(".csv"))
          lines(new FilterCloseInputStream(zin)).foreach(l => out += ((e.getName, l)))
        e = zin.getNextEntry
      }
      out.iterator
    } else if (lower.endsWith(".zst")) {
      val member = path.split('/').last.stripSuffix(".zst")
      lines(new com.github.luben.zstd.ZstdInputStream(
        new ByteArrayInputStream(content))).map(l => (member, l))
    } else {
      val member = path.split('/').last
      lines(new ByteArrayInputStream(content)).map(l => (member, l))
    }
  }

  /** All CSV lines of every archive under `glob`, with lineage columns. */
  def archiveLines(spark: SparkSession, glob: String): Dataset[ArchiveLine] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => decode(p, c).map { case (m, l) => ArchiveLine(p, m, l) } }
  }

  /** Archives → stringly CSV DataFrame (header resolved per the usual CSV
    * rules), ready for [[graft.ops.SilverIngest.clean]]. Lineage travels in
    * `_archive_path` / `_archive_member`. Assumes members share one schema
    * (true for NOAA dailies; the reference makes the same assumption).
    */
  def csv(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val raw = archiveLines(spark, glob)
    val header = raw.head().line
    // column names via the real CSV header rules (quoting etc.), no inference:
    // a header-only read yields the schema and zero rows
    val schema = spark.read.option("header", "true")
      .csv(spark.createDataset(Seq(header))).schema
    // from_csv per line keeps (path, member) provenance on every row — the
    // reference's source_file/source_member contract (data_contracts.md:32-35)
    raw.filter(r => r.line != header)
      .select(
        from_csv(col("line"), schema, Map.empty[String, String]).as("rec"),
        col("path").as("_archive_path"),
        col("member").as("_archive_member"))
      .select(col("rec.*"), col("_archive_path"), col("_archive_member"))
  }
}

/** Prevents member readers from closing the shared ZipInputStream. */
private class FilterCloseInputStream(in: InputStream) extends java.io.FilterInputStream(in) {
  override def close(): Unit = () // keep underlying zip stream open
}
