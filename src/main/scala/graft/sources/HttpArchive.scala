package graft.sources

import java.io.{FileOutputStream, IOException, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.LocalDate

/** HTTP transports for archive discovery and landing — the S1–S3 half the
  * filesystem-backed [[ArchiveIndex.LocalDirIndex]] stubs out. Mirrors the
  * reference's `NOAAIndexClient` (`pipelines/ais_pipeline.py:188-307`:
  * per-year index scrape, probe fallback over template×extension candidates,
  * HEAD with GET fallback) and `download_file` (`:341-370`: skip-if-present,
  * streamed chunks) — extended with true RFC 7233 `Range` resume, so an
  * interrupted multi-GB archive download continues from the received prefix
  * instead of restarting (the reference restarts; resume is what S3's
  * "download w/ resume" contract wants at real archive sizes).
  *
  * Driver-side IO on the JDK `HttpClient` — no added dependency, and the
  * transport is exercised hermetically in `SourcesSpec` against an
  * in-process localhost server (this build environment has no egress; the
  * code paths are the same ones a real deployment hits).
  */
object HttpArchive {

  /** Probe candidates in the reference's order (`ais_pipeline.py:195-199`):
    * each name template × each extension, first hit wins.
    */
  val DefaultTemplates: Seq[String] = Seq("AIS_%Y_%m_%d", "ais-%Y-%m-%d")
  val DefaultExtensions: Seq[String] = Seq(".csv.zst", ".zst", ".zip", ".csv.gz")

  def defaultClient(): HttpClient =
    HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()

  /** HTTP-backed [[ArchiveIndex]]: scrape `base/<year>/index.html` for each
    * year the range touches ([[ArchiveIndex.parseHtmlIndex]] does the
    * parsing); dates the scrape missed fall back to per-date probing —
    * HEAD first, GET on HEAD failure/rejection, exactly the reference's
    * `_probe_single_date` ladder (`ais_pipeline.py:277-307`).
    */
  /** @param probeParallelism dates probed concurrently (bounded pool; 1 =
    *   serial, the reference's shape). A year of daily candidates is ~365 ×
    *   up to templates×extensions round-trips — at real network latency the
    *   serial walk is minutes of pure RTT, so discovery over long ranges
    *   wants a small pool; results are gathered in submission order, so the
    *   output is identical at any parallelism.
    */
  class HttpIndex(baseUrl: String,
                  client: HttpClient = defaultClient(),
                  templates: Seq[String] = DefaultTemplates,
                  extensions: Seq[String] = DefaultExtensions,
                  probeParallelism: Int = 1)
      extends ArchiveIndex {
    private val base = baseUrl.stripSuffix("/")
    require(probeParallelism >= 1, "probeParallelism must be >= 1")

    override def listFilesBetween(from: LocalDate, until: LocalDate): Seq[String] = {
      require(!from.isAfter(until), s"empty range $from..$until")
      val scraped = (from.getYear to until.getYear).flatMap { y =>
        scrapeYear(y).filter(f => !f.date.isBefore(from) && !f.date.isAfter(until))
      }
      val covered = scraped.map(_.date).toSet
      val toProbe = Iterator.iterate(from)(_.plusDays(1))
        .takeWhile(!_.isAfter(until))
        .filterNot(covered)
        .toSeq
      val probed =
        if (probeParallelism == 1)
          // stop walking once this thread is cancelled — each remaining
          // probe would only fail fast against the restored interrupt flag
          toProbe.iterator
            .takeWhile(_ => !Thread.currentThread().isInterrupted)
            .flatMap(probeDate).toSeq
        else {
          // daemon threads + shutdownNow on the failure path: an exception
          // from a Future.get must not leave queued probes issuing HTTP
          // requests after listFilesBetween has already thrown
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            probeParallelism,
            (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
          try {
            val out = toProbe
              .map(d => pool.submit(
                new java.util.concurrent.Callable[Option[(LocalDate, String)]] {
                  def call(): Option[(LocalDate, String)] = probeDate(d)
                }))
              .flatMap(_.get())
            pool.shutdown()
            out
          } catch {
            case scala.util.control.NonFatal(e) =>
              pool.shutdownNow(); throw e
            case e: InterruptedException =>
              pool.shutdownNow(); Thread.currentThread().interrupt(); throw e
          }
        }
      (scraped.map(f => f.date -> f.href) ++ probed).sortBy(_._1.toEpochDay)
        .map(_._2)
    }

    /** One index page per year, the reference's `_scrape_index`; a fetch
      * failure means "no index page" and yields Nil (probe covers the gap).
      */
    def scrapeYear(year: Int): Seq[ArchiveIndex.IndexedFile] = {
      val indexUrl = s"$base/$year/index.html"
      try {
        val resp = client.send(
          HttpRequest.newBuilder(URI.create(indexUrl)).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200)
          ArchiveIndex.parseHtmlIndex(resp.body(), indexUrl)
        else Nil
      } catch {
        case _: IOException => Nil
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); Nil
      }
    }

    /** First template×extension candidate that answers 200 — HEAD, then GET
      * when HEAD errors or is rejected (some object stores disallow it).
      */
    def probeDate(date: LocalDate): Option[(LocalDate, String)] = {
      val names = for (t <- templates; e <- extensions)
        yield ArchiveIndex.candidates(t + e, date, date).head
      names.iterator.map(n => s"$base/${date.getYear}/$n").collectFirst {
        case url if headOk(url) || getOk(url) => date -> url
      }
    }

    private def headOk(url: String): Boolean =
      try {
        client.send(
          HttpRequest.newBuilder(URI.create(url))
            .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
          HttpResponse.BodyHandlers.discarding()).statusCode() == 200
      } catch {
        case _: IOException => false
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); false
      }

    private def getOk(url: String): Boolean =
      try {
        val resp = client.send(
          HttpRequest.newBuilder(URI.create(url)).GET().build(),
          HttpResponse.BodyHandlers.ofInputStream())
        try resp.statusCode() == 200 finally resp.body().close()
      } catch {
        case _: IOException => false
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); false
      }
  }

  /** Download `url` to `dest`, resuming across calls AND retries: bytes
    * land in `dest.part`, each (re)attempt asks for `Range: bytes=<have>-`,
    * and the finished file is atomically moved into place. A server that
    * ignores Range (plain 200) restarts the part file from zero; a complete
    * `dest` short-circuits (the reference's skip-if-present,
    * `ais_pipeline.py:344-347`). Returns `dest`.
    *
    * Failure discipline: transient transport errors (disconnects, 5xx,
    * 408/429) retry up to `maxAttempts`, keeping the received prefix;
    * PERMANENT rejections (other 4xx — 404/403/401…) fail fast on the first
    * response, since re-sending an identical request cannot change them. A
    * 416 (range at/after EOF) promotes the part file ONLY after its size
    * matches the remote object's authoritative length (the 416's
    * `Content-Range: bytes *&#47;N`, RFC 9110 §14.4, with a HEAD
    * Content-Length fallback); a mismatched or unverifiable part is deleted
    * and the download restarts from zero — never silently promoted, which
    * would permanently short-circuit every future download of a
    * changed/shrunk object with a stale file.
    *
    * @param maxAttempts total tries against mid-stream disconnects; each
    *                    retry keeps the already-received prefix.
    */
  def downloadResumable(client: HttpClient, url: String, dest: Path,
                        maxAttempts: Int = 3): Path = {
    require(maxAttempts >= 1, "need at least one attempt")
    if (Files.exists(dest)) return dest
    val part = dest.resolveSibling(dest.getFileName.toString + ".part")
    var attempt = 0
    var lastFailure: IOException = null
    while (attempt < maxAttempts) {
      attempt += 1
      val have = if (Files.exists(part)) Files.size(part) else 0L
      val req = {
        val b = HttpRequest.newBuilder(URI.create(url)).GET()
        if (have > 0) b.header("Range", s"bytes=$have-")
        b.build()
      }
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
        resp.statusCode() match {
          case 206 if have > 0 =>
            appendStream(resp.body(), part, append = true)
            Files.move(part, dest, StandardCopyOption.ATOMIC_MOVE)
            return dest
          case 200 =>
            // full body (first attempt, or server ignored Range): restart
            appendStream(resp.body(), part, append = false)
            Files.move(part, dest, StandardCopyOption.ATOMIC_MOVE)
            return dest
          case 416 if have > 0 =>
            // range starts at/after EOF: the part is whole — unless the
            // remote object changed/shrank between attempts. Promote only
            // on an exact length match against the remote's own statement.
            resp.body().close()
            contentRangeTotal(resp).orElse(headContentLength(client, url)) match {
              case Some(n) if n == have =>
                Files.move(part, dest, StandardCopyOption.ATOMIC_MOVE)
                return dest
              case other =>
                Files.deleteIfExists(part) // stale/over-long: restart clean
                lastFailure = new IOException(
                  s"GET $url: 416 with part size $have vs remote length " +
                    s"${other.fold("unknown")(_.toString)}; restarting from zero")
            }
          case code if code >= 400 && code < 500 && code != 408 && code != 429 =>
            resp.body().close() // permanent: retrying cannot help
            throw new PermanentHttpException(s"GET $url returned $code")
          case code =>
            resp.body().close()
            throw new IOException(s"GET $url returned $code")
        }
      } catch {
        case e: PermanentHttpException => throw e
        case e: IOException => lastFailure = e // part keeps the prefix
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new IOException(s"interrupted downloading $url", e)
      }
    }
    throw new IOException(
      s"download of $url failed after $maxAttempts attempts", lastFailure)
  }

  /** Non-retryable HTTP rejection (4xx other than 408/429). */
  final class PermanentHttpException(msg: String) extends IOException(msg)

  private val ContentRangeTotal = """bytes\s+\*/(\d+)""".r

  /** The total length a 416's `Content-Range: bytes *&#47;N` declares. */
  private def contentRangeTotal(resp: HttpResponse[_]): Option[Long] =
    Option(resp.headers().firstValue("Content-Range").orElse(null)).collect {
      case ContentRangeTotal(n) => n.toLong
    }

  /** Fallback remote-length probe for servers whose 416 omits
    * Content-Range; None when HEAD fails or states no length.
    */
  private def headContentLength(client: HttpClient, url: String): Option[Long] =
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(url))
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.discarding())
      val len = r.headers().firstValueAsLong("Content-Length")
      if (r.statusCode() == 200 && len.isPresent) Some(len.getAsLong) else None
    } catch {
      case _: IOException => None
      case _: InterruptedException =>
        Thread.currentThread().interrupt(); None
    }

  /** End-to-end landing loop — the reference's discover→download→store
    * orchestration (`ais_pipeline.py:575-601`) on these transports: list
    * the range via `index`, download each archive resumably into
    * `destDir` under its own file name, return the local paths in date
    * order. Idempotent: completed files short-circuit, an interrupted run
    * re-invoked continues from the part files.
    */
  def mirror(index: ArchiveIndex, from: LocalDate, until: LocalDate,
             destDir: Path, client: HttpClient = defaultClient(),
             maxAttempts: Int = 3): Seq[Path] = {
    Files.createDirectories(destDir)
    index.listFilesBetween(from, until).map { url =>
      val name = url.substring(url.lastIndexOf('/') + 1)
      downloadResumable(client, url, destDir.resolve(name), maxAttempts)
    }
  }

  /** Stream-copy to the part file in 1 MiB chunks (the reference's chunk
    * size, `ais_pipeline.py:352`); bytes written before a disconnect stay
    * on disk so the next attempt's Range picks up after them.
    */
  private def appendStream(in: InputStream, part: Path, append: Boolean): Unit = {
    val out = new FileOutputStream(part.toFile, append)
    try {
      val buf = new Array[Byte](1024 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally { out.close(); in.close() }
  }
}
