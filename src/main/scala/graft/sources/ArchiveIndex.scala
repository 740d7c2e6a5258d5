package graft.sources

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Archive discovery (S1/S2): the reference finds daily archives either by
  * scraping the NOAA index page (`pipelines/ais_pipeline.py:230-266`) or by
  * HEAD/GET-probing date-templated URLs (`:277-307`). Discovery is driver-side
  * IO, not a query operator — the engine reads whatever URIs an index yields.
  *
  * The date-template expansion + range-walk logic (the testable part) is
  * engine code; transports are pluggable. This environment is zero-egress, so
  * the shipped transport is the local filesystem; an HTTP transport is the
  * same trait with an http client (driver-side, out of engine scope).
  */
trait ArchiveIndex {
  /** URIs of archives whose date lies in [from, until], existing per probe. */
  def listFilesBetween(from: LocalDate, until: LocalDate): Seq[String]
}

object ArchiveIndex {

  /** Expand a date-templated name (`AIS_%Y_%m_%d.zip` style, reference
    * default `ais_pipeline.py:149`) over an inclusive date range.
    */
  def candidates(template: String, from: LocalDate, until: LocalDate): Seq[String] = {
    require(!from.isAfter(until), s"empty range $from..$until")
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(until))
      .map(d => template
        .replace("%Y", DateTimeFormatter.ofPattern("yyyy").format(d))
        .replace("%m", DateTimeFormatter.ofPattern("MM").format(d))
        .replace("%d", DateTimeFormatter.ofPattern("dd").format(d)))
      .toSeq
  }

  /** Filesystem-backed index: probe = existence check (the reference's HEAD
    * request, `ais_pipeline.py:287-295`), with the same alternate-extension
    * fallback (`.zip` then `.csv.zst`, `:296-305`).
    */
  class LocalDirIndex(root: String, template: String,
                      fallbackExtensions: Seq[String] = Seq(".zip", ".csv.zst"))
      extends ArchiveIndex {
    override def listFilesBetween(from: LocalDate, until: LocalDate): Seq[String] =
      candidates(template, from, until).flatMap { name =>
        val base = name.replaceAll("\\.(zip|csv\\.zst|csv)$", "")
        val tried = name +: fallbackExtensions.map(base + _)
        tried.map(n => s"$root/$n").find(p => new java.io.File(p).exists())
      }
  }
}
