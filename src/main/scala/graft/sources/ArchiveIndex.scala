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

  /** A dated archive link discovered from an index page. */
  case class IndexedFile(date: LocalDate, href: String)

  private val AnchorRe = """(?is)<a\b([^>]*)>(.*?)</a>""".r
  // value may contain the other quote kind (onclick="download('x')"), so
  // match to the SAME closing quote that opened the attribute
  private val HrefRe = """(?is)href\s*=\s*(?:"([^"]*)"|'([^']*)')""".r
  private val OnclickRe = """(?is)onclick\s*=\s*(?:"([^"]*)"|'([^']*)')""".r
  // the reference's file-name pattern (`ais_pipeline.py:194`):
  // AIS[_-]YYYY[_-]MM[_-]DD followed by the rest of the name
  private val FileNameRe = """(?i)AIS[_-](\d{4})[_-](\d{2})[_-](\d{2})[^\s"']*""".r

  /** Parse an index page's anchors into dated archive links — the engine-side
    * (transport-free) half of the reference's `_scrape_index`
    * (`ais_pipeline.py:230-266`): per anchor, try href → onclick → text for a
    * date-bearing file name, validate the calendar date, keep only
    * `.zip`/`.zst`, and resolve relative names against the index URL.
    */
  def parseHtmlIndex(html: String, indexUrl: String): Seq[IndexedFile] =
    AnchorRe.findAllMatchIn(html).flatMap { m =>
      val attrs = m.group(1)
      def attrVal(re: scala.util.matching.Regex): Option[String] =
        re.findFirstMatchIn(attrs).map(a => Option(a.group(1)).getOrElse(a.group(2)))
      val candidates = Seq(attrVal(HrefRe), attrVal(OnclickRe), Some(m.group(2))).flatten
      candidates.iterator.flatMap(FileNameRe.findFirstMatchIn).nextOption()
        .flatMap { fm =>
          val name = fm.group(0)
          val lower = name.toLowerCase
          val supported = lower.endsWith(".zip") || lower.endsWith(".zst")
          val date =
            try Some(LocalDate.of(fm.group(1).toInt, fm.group(2).toInt, fm.group(3).toInt))
            catch { case _: java.time.DateTimeException => None }
          date.filter(_ => supported).map { d =>
            val resolved =
              try java.net.URI.create(indexUrl).resolve(name).toString
              catch { case _: IllegalArgumentException =>
                indexUrl.replaceAll("/[^/]*$", "/") + name }
            IndexedFile(d, resolved)
          }
        }
    }.toSeq

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
