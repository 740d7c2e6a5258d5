package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.time.LocalDate
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.ops.{GoldPipeline, SilverIngest, Tracks}
import graft.sources.{ArchiveIndex, ArchiveSource}

/** Specs for archive sources (zip members, zstd streams), date-templated
  * discovery, external-table registration, and the CSV export sink.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val CsvHeader = "MMSI,BaseDateTime,LAT,LON,SOG"
  private val CsvRows = Seq(
    "366123456,2025-01-01 00:03:07,37.7,-122.4,5.1",
    "367000001,2025-01-01 01:03:07,10.0,10.0,1.0")

  private lazy val archiveDir = {
    val dir = Files.createTempDirectory("archives")
    // zip with two csv members + one non-csv member to be skipped
    val zout = new ZipOutputStream(new FileOutputStream(s"$dir/AIS_2025_01_01.zip"))
    def member(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name)); zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    member("day1_a.csv", (CsvHeader +: CsvRows.take(1)).mkString("\n"))
    member("readme.txt", "not a csv")
    member("day1_b.csv", (CsvHeader +: CsvRows.drop(1)).mkString("\n"))
    zout.close()
    // zstd-compressed csv
    val zst = new com.github.luben.zstd.ZstdOutputStream(
      new FileOutputStream(s"$dir/AIS_2025_01_02.csv.zst"))
    zst.write((CsvHeader +: CsvRows).mkString("\n").getBytes("UTF-8"))
    zst.close()
    dir.toString
  }

  test("permissive decode: a truncated archive keeps its prefix + one corrupt marker") {
    val dir = Files.createTempDirectory("corrupt").toString
    // healthy zst
    val zst = new com.github.luben.zstd.ZstdOutputStream(
      new FileOutputStream(s"$dir/AIS_2025_02_01.csv.zst"))
    zst.write((CsvHeader +: CsvRows).mkString("\n").getBytes("UTF-8"))
    zst.close()
    // zip truncated mid-member: enough bytes to decode the header line,
    // then a deflate error
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new ZipOutputStream(bos)
    zo.putNextEntry(new ZipEntry("big.csv"))
    zo.write((CsvHeader + "\n").getBytes("UTF-8"))
    zo.write(Array.fill[Byte](64 * 1024)('x'))
    zo.closeEntry(); zo.close()
    val whole = bos.toByteArray
    val fos = new FileOutputStream(s"$dir/AIS_2025_02_02.zip")
    fos.write(whole, 0, whole.length / 2); fos.close()
    // strict mode: the decode failure fails the job (bad file surfaces)
    val strict = intercept[org.apache.spark.SparkException] {
      ArchiveSource.archiveLines(spark, s"$dir/*").collect()
    }
    assert(strict.getMessage != null)
    // permissive: healthy archive intact, truncated one keeps its decoded
    // prefix and ends with exactly one auditable marker
    val got = ArchiveSource
      .archiveLines(spark, s"$dir/*", permissive = true).collect()
    val healthy = got.filter(_.path.endsWith(".csv.zst"))
    assert(healthy.length === 3 && healthy.count(_.line == CsvHeader) === 1)
    val markers = got.filter(_.member === ArchiveSource.CorruptMember)
    assert(markers.length === 1 && markers.head.path.endsWith(".zip"),
      s"one corruption marker for the truncated zip, got ${markers.toSeq}")
    assert(got.exists(r => r.path.endsWith(".zip") && r.line == CsvHeader),
      "lines decoded before the corruption point are kept")
    // the DSv2 face honors the same option
    val v2 = spark.read.format("graft-archive").option("permissive", "true")
      .load(s"$dir/*").select("member", "line").collect()
    assert(v2.count(_.getString(0) == ArchiveSource.CorruptMember) === 1,
      "DSv2 permissive read emits the same single marker")
  }

  test("zip archive: csv members stream out with lineage, non-csv skipped") {
    val got = ArchiveSource.archiveLines(spark, s"$archiveDir/AIS_2025_01_01.zip")
      .collect()
    assert(got.count(_.line == CsvHeader) === 2) // one header per member
    assert(got.map(_.member).distinct.sorted.toSeq === Seq("day1_a.csv", "day1_b.csv"))
    assert(got.length === 4)
  }

  test("zstd archive: lines decode through zstd-jni") {
    val got = ArchiveSource.archiveLines(spark, s"$archiveDir/AIS_2025_01_02.csv.zst")
      .collect()
    assert(got.length === 3)
    assert(got.head.member === "AIS_2025_01_02.csv")
  }

  test("archives → csv → silver clean end-to-end, lineage per row") {
    val df = ArchiveSource.csv(spark, archiveDir)
    assert(df.columns.toSeq === Seq("MMSI", "BaseDateTime", "LAT", "LON", "SOG",
      "_archive_path", "_archive_member"))
    assert(df.count() === 4) // 2 rows per day
    // per-row member lineage survives parsing: each zip member's row keeps
    // the member it came from (the reference's source_member contract)
    val byMember = df.filter(col("_archive_path").endsWith(".zip"))
      .select("MMSI", "_archive_member").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byMember === Map("366123456" -> "day1_a.csv", "367000001" -> "day1_b.csv"))
    val cleaned = SilverIngest.clean(df, numBuckets = 96)
    assert(cleaned.count() === 4)
    assert(cleaned.select("bucket_id").distinct().count() === 2)
  }

  test("zip decode is lazy: reading the first lines leaves later members untouched") {
    // two ~60 KB members of poorly-compressible content; a counting stream
    // proves bounded buffering — consuming member 1's first line must not
    // pull member 2 (or even the bulk of member 1) through the decoder
    val rnd = new scala.util.Random(7)
    def bigMember(n: Int) =
      (0 until 800).map(i => s"$n,$i,${rnd.alphanumeric.take(64).mkString}")
        .mkString("\n")
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val zout = new ZipOutputStream(bos)
      Seq(1, 2).foreach { n =>
        zout.putNextEntry(new ZipEntry(s"m$n.csv"))
        zout.write(bigMember(n).getBytes("UTF-8"))
        zout.closeEntry()
      }
      zout.close()
      bos.toByteArray
    }
    assert(bytes.length > 80000) // random payload stays ~incompressible

    var readCount = 0L
    var closed = false
    def countingStream(): java.io.InputStream =
      new java.io.FilterInputStream(new java.io.ByteArrayInputStream(bytes)) {
        override def read(): Int = { val r = super.read(); if (r >= 0) readCount += 1; r }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          val r = super.read(b, off, len); if (r > 0) readCount += r; r
        }
        override def close(): Unit = { closed = true; super.close() }
      }

    val it = ArchiveSource.decodeStream("x.zip", countingStream)
    val first = it.next()
    assert(first._1 === "m1.csv" && first._2.startsWith("1,0,"))
    assert(readCount < 40000,
      s"read $readCount of ${bytes.length} bytes for one line — decode is not lazy")
    assert(!closed)

    // full consumption still yields every line of both members, then closes
    val rest = it.toSeq
    assert(1 + rest.length === 1600)
    assert(rest.last._1 === "m2.csv")
    assert(closed)
  }

  test("DSv2: format(\"graft-archive\") matches the helper, partition-per-archive") {
    val df = spark.read.format("graft-archive").load(s"$archiveDir/*")
    val got = df.collect().map(r =>
      (r.getString(0).split('/').last, r.getString(1), r.getString(2)))
    val want = ArchiveSource.archiveLines(spark, s"$archiveDir/{*.zip,*.zst}")
      .collect().map(a => (a.path.split('/').last, a.member, a.line))
    assert(got.sorted.toSeq === want.sorted.toSeq)
    // one input partition per archive (zip members are not splittable)
    assert(df.rdd.getNumPartitions === 2)
  }

  test("DSv2: a user schema is honored as a subset, rejected otherwise") {
    val subset = spark.read.format("graft-archive")
      .schema("line STRING").load(s"$archiveDir/*.zip")
    assert(subset.columns.toSeq === Seq("line"))
    assert(subset.collect().length === 4)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-archive")
        .schema("nope STRING").load(s"$archiveDir/*.zip").collect()
    }
    assert(e.getMessage.contains("nope"))
  }

  test("DSv2: required-column pushdown prunes the scan schema") {
    val df = spark.read.format("graft-archive").load(s"$archiveDir/*.zip")
      .select("line")
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graft-archive")).getOrElse("")
    assert(!scanLine.contains("member"),
      s"scan must carry only the selected column: $scanLine")
    assert(df.collect().length === 4)
  }

  test("date-templated discovery probes existence with extension fallback") {
    val idx = new ArchiveIndex.LocalDirIndex(archiveDir, "AIS_%Y_%m_%d.zip")
    val found = idx.listFilesBetween(
      LocalDate.of(2025, 1, 1), LocalDate.of(2025, 1, 3))
    assert(found.length === 2) // day1 zip, day2 via .csv.zst fallback; day3 missing
    assert(found.head.endsWith("AIS_2025_01_01.zip"))
    assert(found(1).endsWith("AIS_2025_01_02.csv.zst"))
    assert(ArchiveIndex.candidates("x_%Y%m%d", LocalDate.of(2025, 2, 27),
      LocalDate.of(2025, 3, 1)) === Seq("x_20250227", "x_20250228", "x_20250301"))
  }

  test("HTML index parse: href/onclick/text anchors, date + suffix filters") {
    val html =
      """<html><body>
        |<a href="AIS_2025_01_01.zip">day 1</a>
        |<a href="/data/2025/AIS_2025_01_02.csv.zst">day 2</a>
        |<a onclick="download('AIS_2025_01_03.zip')">day 3 (onclick)</a>
        |<a href="#">AIS_2025_01_04.zip</a>
        |<a href="AIS_2025_13_40.zip">bad calendar date</a>
        |<a href="AIS_2025_01_05.txt">unsupported suffix</a>
        |<a href="readme.html">no date at all</a>
        |</body></html>""".stripMargin
    val got = ArchiveIndex.parseHtmlIndex(html, "https://host/2025/index.html")
    assert(got.map(_.date.getDayOfMonth) === Seq(1, 2, 3, 4))
    assert(got(0).href === "https://host/2025/AIS_2025_01_01.zip") // relative
    // like the reference, only the matched file NAME resolves against the
    // index URL (ais_pipeline.py:268-275 returns match.group(0), not the path)
    assert(got(1).href === "https://host/2025/AIS_2025_01_02.csv.zst")
    assert(got(2).href === "https://host/2025/AIS_2025_01_03.zip") // from onclick
    assert(got(3).href === "https://host/2025/AIS_2025_01_04.zip") // from anchor text
  }

  // ---- HTTP transports (S1–S3), hermetic against an in-process server ----

  /** Localhost server: `routes` maps absolute paths to bodies. HEAD is
    * rejected with 405 on paths in `noHead` (exercising the GET fallback);
    * GET honors `Range: bytes=N-` with 206/416; paths in `cutFirstGet`
    * declare the full length but close after half the body ONCE (mid-stream
    * disconnect), serving complete responses afterwards.
    */
  private def withHttpServer(routes: Map[String, Array[Byte]],
                             noHead: Set[String] = Set.empty,
                             cutFirstGet: Set[String] = Set.empty,
                             cutGets: Map[String, Int] = Map.empty)
                            (body: (String, () => Seq[String]) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // per-path count of GET responses to cut halfway (any Range)
    val cutLeft = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    (cutGets ++ cutFirstGet.map(_ -> 1)).foreach { case (p, n) =>
      cutLeft.put(p, new java.util.concurrent.atomic.AtomicInteger(n))
    }
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val range = Option(ex.getRequestHeaders.getFirst("Range"))
      seen.add(s"${ex.getRequestMethod} $path${range.map(" " + _).getOrElse("")}")
      routes.get(path) match {
        case None => ex.sendResponseHeaders(404, -1); ex.close()
        case Some(bytes) if ex.getRequestMethod == "HEAD" =>
          if (noHead(path)) ex.sendResponseHeaders(405, -1)
          else ex.sendResponseHeaders(200, -1) // HEAD: headers only
          ex.close()
        case Some(bytes) =>
          val from = range.map(_.stripPrefix("bytes=").stripSuffix("-").toLong)
            .getOrElse(0L)
          if (from >= bytes.length) {
            // RFC 9110 §14.4: a 416 SHOULD state the selected object's
            // length — downloadResumable validates the part against it
            ex.getResponseHeaders.set("Content-Range", s"bytes */${bytes.length}")
            ex.sendResponseHeaders(416, -1); ex.close()
          }
          else {
            val slice = bytes.drop(from.toInt)
            val counter = cutLeft.get(path)
            val cut = counter != null && counter.getAndDecrement() > 0
            if (cut) {
              // declare the full length, deliver half, drop the connection
              ex.sendResponseHeaders(if (from > 0) 206 else 200, slice.length)
              ex.getResponseBody.write(slice, 0, slice.length / 2)
              ex.getResponseBody.flush()
              ex.close()
            } else {
              ex.sendResponseHeaders(if (from > 0) 206 else 200, slice.length)
              ex.getResponseBody.write(slice)
              ex.close()
            }
          }
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}",
      () => { import scala.jdk.CollectionConverters._; seen.asScala.toSeq })
    finally server.stop(0)
  }

  test("HTTP index (S1/S2): year scrape + per-date probe with HEAD→GET fallback") {
    val html = """<a href="AIS_2024_01_01.zip">day 1</a>"""
    withHttpServer(
      routes = Map(
        "/arch/2024/index.html" -> html.getBytes("UTF-8"),
        "/arch/2024/AIS_2024_01_01.zip" -> "z1".getBytes("UTF-8"),
        "/arch/2024/AIS_2024_01_02.csv.zst" -> "z2".getBytes("UTF-8")),
      noHead = Set("/arch/2024/AIS_2024_01_02.csv.zst")) { (base, seen) =>
      // parallel probing must yield the identical (date-sorted) listing
      val idx = new graft.sources.HttpArchive.HttpIndex(s"$base/arch",
        probeParallelism = 3)
      val found = idx.listFilesBetween(
        LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 3))
      // day 1 from the scrape (resolved against the index URL), day 2 from
      // the probe despite the 405 on HEAD, day 3 genuinely absent
      assert(found === Seq(
        s"$base/arch/2024/AIS_2024_01_01.zip",
        s"$base/arch/2024/AIS_2024_01_02.csv.zst"))
      val log = seen()
      assert(log.contains("GET /arch/2024/index.html"), "scrape fetches the index")
      assert(log.contains("HEAD /arch/2024/AIS_2024_01_02.csv.zst") &&
        log.contains("GET /arch/2024/AIS_2024_01_02.csv.zst"),
        s"probe must fall back HEAD→GET, saw: $log")
      assert(!log.exists(_.contains("AIS_2024_01_01.zip")),
        "scraped date must not be re-probed")
    }
  }

  test("HTTP index: a probe range crossing a year boundary hits both year URLs") {
    withHttpServer(routes = Map(
      "/arch/2024/AIS_2024_12_31.csv.zst" -> "a".getBytes("UTF-8"),
      "/arch/2025/ais-2025-01-01.csv.zst" -> "b".getBytes("UTF-8"))) {
      (base, _) =>
      val idx = new graft.sources.HttpArchive.HttpIndex(s"$base/arch")
      val found = idx.listFilesBetween(
        LocalDate.of(2024, 12, 31), LocalDate.of(2025, 1, 1))
      // each date probes under ITS year's directory, template fallback
      // included (2025-01-01 only exists under the second name template)
      assert(found === Seq(
        s"$base/arch/2024/AIS_2024_12_31.csv.zst",
        s"$base/arch/2025/ais-2025-01-01.csv.zst"))
    }
  }

  test("HTTP mirror: discover → land end-to-end, idempotent on re-run") {
    val html = """<a href="AIS_2024_01_01.zip">d1</a>
                 |<a href="AIS_2024_01_02.zip">d2</a>""".stripMargin
    withHttpServer(routes = Map(
      "/arch/2024/index.html" -> html.getBytes("UTF-8"),
      "/arch/2024/AIS_2024_01_01.zip" -> "payload-one".getBytes("UTF-8"),
      "/arch/2024/AIS_2024_01_02.zip" -> "payload-two".getBytes("UTF-8"))) {
      (base, seen) =>
      val dest = Files.createTempDirectory("mirror")
      val idx = new graft.sources.HttpArchive.HttpIndex(s"$base/arch")
      val landed = graft.sources.HttpArchive.mirror(idx,
        LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 2), dest)
      assert(landed.map(_.getFileName.toString) ===
        Seq("AIS_2024_01_01.zip", "AIS_2024_01_02.zip"))
      assert(new String(Files.readAllBytes(landed(0)), "UTF-8") === "payload-one")
      // re-run: discovery refetches the index, but no archive re-downloads
      val before = seen().count(_.contains(".zip"))
      graft.sources.HttpArchive.mirror(idx,
        LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 2), dest)
      assert(seen().count(_.contains(".zip")) === before,
        "landed archives must short-circuit on the second mirror pass")
    }
  }

  test("full ingest chain: HTTP discover → mirror → graft-archive read → silver") {
    // the reference's whole bronze→silver path over the wire in one pass:
    // real zip + zstd archives served by the hermetic server, discovered via
    // the year index, landed resumably, read through the DSv2 source, and
    // cleaned to bucketed silver rows with per-row lineage
    val html = """<a href="AIS_2025_01_01.zip">d1</a>
                 |<a href="AIS_2025_01_02.csv.zst">d2</a>""".stripMargin
    val zipBytes = Files.readAllBytes(
      java.nio.file.Paths.get(s"$archiveDir/AIS_2025_01_01.zip"))
    val zstBytes = Files.readAllBytes(
      java.nio.file.Paths.get(s"$archiveDir/AIS_2025_01_02.csv.zst"))
    withHttpServer(routes = Map(
      "/arch/2025/index.html" -> html.getBytes("UTF-8"),
      "/arch/2025/AIS_2025_01_01.zip" -> zipBytes,
      "/arch/2025/AIS_2025_01_02.csv.zst" -> zstBytes)) { (base, _) =>
      val bronze = Files.createTempDirectory("chain-bronze")
      val idx = new graft.sources.HttpArchive.HttpIndex(s"$base/arch")
      val landed = graft.sources.HttpArchive.mirror(idx,
        LocalDate.of(2025, 1, 1), LocalDate.of(2025, 1, 2), bronze)
      assert(landed.length === 2)
      val silver = SilverIngest.clean(
        ArchiveSource.csv(spark, s"$bronze/*"), numBuckets = 96)
      val rows = silver.collect()
      assert(rows.length === 4, s"2 archives × 2 rows, got ${rows.length}")
      // lineage points at the LANDED bronze copies, not the remote URL
      val paths = silver.select("_archive_path").distinct()
        .collect().map(_.getString(0)).sorted
      assert(paths.forall(_.contains(bronze.getFileName.toString)), paths.mkString(","))
      assert(silver.select("bucket_id").distinct().count() === 2)
    }
  }

  test("HTTP download (S3): TWO successive disconnects, each resume continues the prefix") {
    val payload = Array.tabulate[Byte](96 * 1024)(i => (i * 17 + 3).toByte)
    withHttpServer(
      routes = Map("/arch/2024/big2.zip" -> payload),
      cutGets = Map("/arch/2024/big2.zip" -> 2)) { (base, seen) =>
      val dest = Files.createTempDirectory("dl2").resolve("big2.zip")
      val got = graft.sources.HttpArchive.downloadResumable(
        graft.sources.HttpArchive.defaultClient(),
        s"$base/arch/2024/big2.zip", dest, maxAttempts = 3)
      assert(java.util.Arrays.equals(Files.readAllBytes(got), payload))
      val ranges = seen().filter(_.contains("bytes=")).map(_.split("bytes=")(1))
      // cut at 48 KiB, then the 206 resume cut again halfway (+24 KiB) —
      // each retry continues after everything received so far
      assert(ranges === Seq(s"${48 * 1024}-", s"${72 * 1024}-"),
        s"monotone resume offsets expected, got $ranges")
    }
  }

  test("HTTP download (S3): a complete part file finalizes via the 416 path") {
    // crash AFTER the last byte but BEFORE the atomic rename: the next call
    // asks for Range at EOF, the server answers 416, and the part file is
    // promoted without re-downloading anything
    val payload = "the whole archive payload".getBytes("UTF-8")
    withHttpServer(routes = Map("/arch/2024/done.zip" -> payload)) {
      (base, seen) =>
      val dir = Files.createTempDirectory("dl416")
      val dest = dir.resolve("done.zip")
      Files.write(dir.resolve("done.zip.part"), payload) // complete part
      val got = graft.sources.HttpArchive.downloadResumable(
        graft.sources.HttpArchive.defaultClient(),
        s"$base/arch/2024/done.zip", dest)
      assert(java.util.Arrays.equals(Files.readAllBytes(got), payload))
      assert(!Files.exists(dir.resolve("done.zip.part")), "part promoted")
      assert(seen().forall(_.contains("bytes=")) && seen().size === 1,
        s"only the one 416-answered Range request expected: ${seen()}")
    }
  }

  test("HTTP download (S3): a STALE over-long part is discarded, not promoted") {
    // the remote object shrank between attempts: the leftover part is
    // longer than the server's file, so Range-at-EOF answers 416 with a
    // Content-Range length that does NOT match — the part must be deleted
    // and the object re-downloaded from zero, never renamed into place
    val payload = "fresh smaller payload".getBytes("UTF-8")
    withHttpServer(routes = Map("/arch/2024/shrunk.zip" -> payload)) {
      (base, seen) =>
      val dir = Files.createTempDirectory("dlstale")
      val dest = dir.resolve("shrunk.zip")
      val stale = payload ++ "…trailing bytes from the old object".getBytes("UTF-8")
      Files.write(dir.resolve("shrunk.zip.part"), stale)
      val got = graft.sources.HttpArchive.downloadResumable(
        graft.sources.HttpArchive.defaultClient(),
        s"$base/arch/2024/shrunk.zip", dest, maxAttempts = 3)
      assert(java.util.Arrays.equals(Files.readAllBytes(got), payload),
        "dest must hold the fresh remote bytes, not the stale part")
      assert(!Files.exists(dir.resolve("shrunk.zip.part")), "part promoted/cleaned")
      // first a Range GET (answered 416), then the clean full re-download
      assert(seen().head.contains(s"bytes=${stale.length}-"), seen().mkString(","))
      assert(seen().count(!_.contains("bytes=")) === 1,
        s"exactly one from-zero re-download expected: ${seen()}")
    }
  }

  test("HTTP download (S3): permanent 404 fails fast, no retry storm") {
    withHttpServer(routes = Map.empty) { (base, seen) =>
      val dest = Files.createTempDirectory("dl404").resolve("missing.zip")
      val e = intercept[java.io.IOException] {
        graft.sources.HttpArchive.downloadResumable(
          graft.sources.HttpArchive.defaultClient(),
          s"$base/arch/2024/missing.zip", dest, maxAttempts = 5)
      }
      assert(e.getMessage.contains("404"))
      assert(seen().size === 1,
        s"a permanent 4xx must not be retried: ${seen()}")
    }
  }

  test("HTTP download (S3): mid-stream disconnect resumes via Range, not restart") {
    val payload = Array.tabulate[Byte](96 * 1024)(i => (i * 31 + 7).toByte)
    withHttpServer(
      routes = Map("/arch/2024/big.zip" -> payload),
      cutFirstGet = Set("/arch/2024/big.zip")) { (base, seen) =>
      val dest = Files.createTempDirectory("dl").resolve("big.zip")
      val got = graft.sources.HttpArchive.downloadResumable(
        graft.sources.HttpArchive.defaultClient(),
        s"$base/arch/2024/big.zip", dest)
      assert(java.util.Arrays.equals(Files.readAllBytes(got), payload),
        "resumed file must be byte-identical to the payload")
      val ranged = seen().filter(_.contains("bytes="))
      assert(ranged.nonEmpty, s"second attempt must send a Range header: ${seen()}")
      assert(ranged.head.endsWith(s"bytes=${payload.length / 2}-"),
        s"resume must continue exactly after the received prefix, saw $ranged")
      // skip-if-present: a second call makes NO further requests
      val before = seen().size
      graft.sources.HttpArchive.downloadResumable(
        graft.sources.HttpArchive.defaultClient(), s"$base/arch/2024/big.zip", dest)
      assert(seen().size === before, "existing complete file short-circuits")
    }
  }

  test("external table registration + partition recovery (K5)") {
    val loc = Files.createTempDirectory("ext_tbl").toString + "/t"
    Seq((1L, "2025-01-01 00:00:00"), (2L, "2025-01-02 00:00:00"))
      .toDF("mmsi", "ts")
      .withColumn("day", dayofmonth(col("ts").cast("timestamp")))
      .write.partitionBy("day").parquet(loc)
    GoldPipeline.registerExternalTable(spark, "ext_gold_test", loc)
    try {
      assert(spark.sql("SELECT count(*) FROM ext_gold_test").as[Long].head() === 2L)
      assert(spark.sql("SELECT DISTINCT day FROM ext_gold_test").as[Int]
        .collect().sorted.toSeq === Seq(1, 2))
    } finally spark.sql("DROP TABLE IF EXISTS ext_gold_test")
  }

  test("JSONL ingest: clean rows parse, corrupt and required-null lines quarantine with raw text") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl").toString
    val f = new java.io.File(dir, "docs.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"doc_id": 1, "text": "hello world", "lang": "en"}""")
    w.println("""{"doc_id": 2, "text": "bonjour"}""")              // lang absent → null, still clean
    w.println("")                                                  // blank seam → skipped, NOT quarantined
    w.println("""{"doc_id": 3, "lang": "de"}""")                   // text absent → required → quarantine
    w.println("""{"doc_id": "4", "text" broken json""")            // malformed → quarantine
    w.println("   ")                                               // whitespace-only → skipped
    w.println("""{"doc_id": 5, "text": "ok", "lang": "fr"}""")
    w.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val (clean, quarantine) = graft.sources.JsonlSource.readSplit(
      spark, f.toString, schema, requiredCols = Seq("doc_id", "text"))
    assert(clean.columns.toSeq === Seq("doc_id", "text", "lang"),
      "clean frame carries exactly the declared schema")
    val rows = clean.orderBy("doc_id")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(rows === Seq((1L, "hello world", Some("en")),
      (2L, "bonjour", None), (5L, "ok", Some("fr"))))
    val q = quarantine.as[String].collect().toSeq
    assert(q.length === 2, s"one malformed + one required-null line: $q")
    assert(q.exists(_.contains("broken json")),
      "the malformed raw line survives verbatim for replay/debugging")
    assert(q.contains("""{"doc_id": 3, "lang": "de"}"""),
      s"the required-null line is the VERBATIM source line, not a projected rebuild: $q")
  }

  test("JSONL quarantine preserves fields OUTSIDE the declared schema verbatim") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl3").toString
    val f = new java.io.File(dir, "extra.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    // legal JSON, required text missing — quarantined; the provenance field
    // is NOT in the declared schema and must still survive for replay
    w.println("""{"doc_id": 7, "provenance": "crawl-7"}""")
    w.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (_, quarantine) = graft.sources.JsonlSource.readSplit(
      spark, f.toString, schema, requiredCols = Seq("text"))
    val q = quarantine.as[String].collect().toSeq
    assert(q === Seq("""{"doc_id": 7, "provenance": "crawl-7"}"""),
      s"undeclared fields must not be dropped from quarantine: $q")
  }

  test("JSONL export shards by record count and round-trips through the schema-enforced read") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl_out").toString + "/shards"
    val df = (1L to 250L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .coalesce(1) // one task → the roll must come from maxRecordsPerFile
    graft.sources.JsonlSource.writeShards(df, dir, maxRecordsPerFile = 100L)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(shards.length === 3, s"250 rows at 100/file → 3 shards: ${shards.length}")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (clean, quarantine) = graft.sources.JsonlSource.readSplit(
      spark, dir, schema, requiredCols = Seq("doc_id"))
    assert(quarantine.count() === 0L, "own export must re-ingest cleanly")
    assert(clean.count() === 250L)
    assert(clean.agg(sum("doc_id")).head.getLong(0) === 250L * 251 / 2)
  }

  test("JSONL ingest: type drift on a declared column quarantines, not silently widens") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl2").toString
    val f = new java.io.File(dir, "drift.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"doc_id": 10, "text": "fine"}""")
    w.println("""{"doc_id": "not-a-number", "text": "drifted"}""")
    w.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (clean, quarantine) = graft.sources.JsonlSource.readSplit(
      spark, f.toString, schema, requiredCols = Seq("doc_id"))
    assert(clean.as[(Long, String)].collect().toSeq === Seq((10L, "fine")))
    assert(quarantine.count() === 1L,
      "a row whose id no longer parses as LONG must surface, not vanish")
  }

  test("csv export sink writes single header file (K7)") {
    val out = Files.createTempDirectory("csv_out").toString + "/export"
    Tracks.exportCsv(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head === "id,v" && lines.length === 3)
    assert(Tracks.exportFileName("tracks", "2024-01-05 00:00", "2024-01-25") ===
      "tracks_20240105 0000_20240125.csv".replace(" ", ""))
  }
}
