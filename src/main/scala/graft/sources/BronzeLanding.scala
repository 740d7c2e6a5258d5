package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path => HadoopPath}
import org.apache.spark.sql.SparkSession

/** Bronze raw landing (K1): copy discovered archives into the bronze zone
  * verbatim, skipping archives already landed — the reference's
  * download-if-absent step (`pipelines/ais_pipeline.py:373-380`). Landing is
  * driver-side IO by design (one sequential copy per archive, exactly like
  * the reference's per-file loop); the engine takes over from the bronze
  * path via [[ArchiveSource]].
  *
  * "Already landed" = same file name AND same byte length — a partial copy
  * from a killed run has a short length and is re-landed, mirroring the
  * reference's size check on resume (`ais_pipeline.py:341-353`).
  */
object BronzeLanding {

  /** One landing decision: where the archive came from, where it lives in
    * bronze, and whether bytes actually moved this run.
    */
  case class Landed(source: String, target: String, copied: Boolean, bytes: Long)

  /** Land `sources` (any Hadoop-readable URIs) under `bronzeDir`. Idempotent:
    * a re-run copies nothing and reports `copied = false` per file.
    */
  def land(spark: SparkSession, sources: Seq[String], bronzeDir: String): Seq[Landed] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val outDir = new HadoopPath(bronzeDir)
    val outFs = outDir.getFileSystem(conf)
    outFs.mkdirs(outDir)
    sources.map { src =>
      val srcPath = new HadoopPath(src)
      val srcFs = srcPath.getFileSystem(conf)
      val srcLen = srcFs.getFileStatus(srcPath).getLen
      val target = new HadoopPath(outDir, srcPath.getName)
      val fresh = !outFs.exists(target) || outFs.getFileStatus(target).getLen != srcLen
      if (fresh)
        FileUtil.copy(srcFs, srcPath, outFs, target,
          /* deleteSource = */ false, /* overwrite = */ true, conf)
      Landed(src, target.toString, copied = fresh, bytes = srcLen)
    }
  }

  /** Discover-and-land: walk an [[ArchiveIndex]] over a date range and land
    * every archive it yields — the reference's daily loop
    * (`ais_pipeline.py:575-604`) as one call.
    */
  def landRange(spark: SparkSession, index: ArchiveIndex, bronzeDir: String,
                from: java.time.LocalDate, until: java.time.LocalDate): Seq[Landed] =
    land(spark, index.listFilesBetween(from, until), bronzeDir)
}
