package graft

import org.apache.spark.sql.functions._

import graft.expressions.{GeoCell, StableHashBucket, VecDot}
import graft.functions.{geo_cell, normalize_ts, overlap_coef, stable_bucket, vec_dot}

/** Unit specs for the custom Catalyst expressions and column functions. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- GeoCell

  test("GeoCell.cellId: 15-hex-char contract, packing, fixture vector") {
    // origin at res 7: q=r=0 → [7][2^27][2^27] = 0x0780000008000000
    assert(GeoCell.cellId(0.0, 0.0, 7) === "780000008000000")
    val hex15 = "^[0-9a-f]{15}$".r
    for ((la, lo) <- Seq((37.7749, -122.4194), (-33.8688, 151.2093),
        (89.9999, -179.9999), (-90.0, 180.0), (0.0, 0.0))) {
      val c = GeoCell.cellId(la, lo, 7)
      assert(hex15.matches(c), s"not 15 hex chars: $c")
      // decode inverts the packing; res travels in the top 4 bits
      val (res, q, r) = GeoCell.decode(c)
      assert(res === 7)
      assert(GeoCell.axial(la, lo, 7) === ((q, r)))
    }
  }

  test("GeoCell: hex adjacency — 6 symmetric neighbors, k-ring sizes") {
    val c = GeoCell.cellId(37.7749, -122.4194, 7)
    val ns = GeoCell.neighbors(c)
    assert(ns.length === 6 && ns.distinct.length === 6 && !ns.contains(c))
    // edge adjacency is symmetric and res-preserving
    ns.foreach { n =>
      assert(GeoCell.neighbors(n).contains(c))
      assert(GeoCell.decode(n)._1 === 7)
    }
    // k-ring: 1 + 3k(k+1) cells, ring 1 = self + the 6 neighbors
    assert(GeoCell.kRing(c, 0) === Seq(c))
    assert(GeoCell.kRing(c, 1).toSet === (ns :+ c).toSet)
    assert(GeoCell.kRing(c, 3).length === 1 + 3 * 3 * 4)
    // hexDistance is the metric the rings are defined by
    assert(GeoCell.hexDistance(c, c) === 0)
    ns.foreach(n => assert(GeoCell.hexDistance(c, n) === 1))
    GeoCell.kRing(c, 2).foreach(x => assert(GeoCell.hexDistance(c, x) <= 2))
    assert(GeoCell.kRing(c, 2).count(GeoCell.hexDistance(c, _) == 2) === 12)
  }

  test("GeoCell: cell center maps back to its own cell") {
    for ((la, lo) <- Seq((37.7749, -122.4194), (-33.8688, 151.2093), (0.1, 0.1));
         res <- Seq(3, 7, 11)) {
      val c = GeoCell.cellId(la, lo, res)
      val (cla, clo) = GeoCell.center(c)
      assert(GeoCell.cellId(cla, clo, res) === c)
    }
  }

  test("geo_cell column matches the scala function (eval + codegen paths)") {
    val df = Seq((37.7749, -122.4194), (-33.8688, 151.2093), (0.0, 0.0))
      .toDF("lat", "lon")
    val rows = df.select(geo_cell(col("lat"), col("lon"), 7)).as[String].collect()
    val want = Seq((37.7749, -122.4194), (-33.8688, 151.2093), (0.0, 0.0))
      .map { case (a, b) => GeoCell.cellId(a, b, 7) }
    assert(rows.toSeq === want)
  }

  test("geo_cell is null-safe") {
    val df = Seq((Some(1.0), None: Option[Double])).toDF("lat", "lon")
    assert(df.select(geo_cell(col("lat"), col("lon"), 7)).first().isNullAt(0))
  }

  // ------------------------------------------------------- StableHashBucket

  test("StableHashBucket matches the reference python semantics bit-exactly") {
    // expected = int(sha256(str(v).encode()).hexdigest()[:16], 16) % n
    // (pipelines/ais_pipeline.py:532-535), vectors precomputed externally
    val vectors96 = Seq(
      ("123456789", 11L), ("987654321", 16L), ("0", 24L),
      ("hello", 46L), ("366123456", 30L))
    vectors96.foreach { case (s, want) =>
      assert(StableHashBucket.bucket(s, 96) === want, s"bucket96($s)")
    }
    assert(StableHashBucket.bucket("123456789", 64) === 43L)
    assert(StableHashBucket.bucket("987654321", 64) === 16L)
  }

  test("stable_bucket column is stable across invocations and rows") {
    val df = Seq("123456789", "987654321", "hello").toDF("mmsi")
    val a = df.select(stable_bucket(col("mmsi"), 96)).as[Long].collect().toSeq
    val b = df.select(stable_bucket(col("mmsi"), 96)).as[Long].collect().toSeq
    assert(a === b)
    assert(a === Seq(11L, 16L, 46L))
  }

  // ----------------------------------------------------------------- VecDot

  test("VecDot strict in-order fold matches manual loop") {
    val a = Array(0.1, -0.2, 0.3, 1e-17, 1.0)
    val b = Array(1.0, 2.0, -3.0, 1.0, 1e-17)
    var want = 0.0
    (0 until 5).foreach(i => want += a(i) * b(i))
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).as[Double].first()
    assert(got === want) // bit-exact, not approx
  }

  test("vec_dot handles length mismatch via min-length") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).as[Double].first() === 14.0)
  }

  // ----------------------------------------------------------- overlap_coef

  test("overlap coefficient: NULLIF zero-denominator yields null, subset yields 1.0") {
    val df = Seq((6L, 6L, 24L), (3L, 0L, 5L), (2L, 4L, 4L)).toDF("shared", "a", "b")
    val got = df.select(overlap_coef(col("shared"), col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 1.0)  // A ⊂ B: |A∩B|/min = 6/6 (README.md:164-168)
    assert(got(1).isNullAt(0))           // min(0,5)=0 → NULLIF → null
    assert(got(2).getDouble(0) === 0.5)
  }

  // ----------------------------------------------------- rolling kgram hash

  test("rolling kgram hash matches the direct polynomial; short text is empty") {
    // independent direct recompute: h(j) = Σ byte·257^(k-1-i) mod 2^31-1
    def direct(s: String, k: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8").map(_ & 0xff)
      (0 to b.length - k).map { j =>
        b.slice(j, j + k).foldLeft(0L)((acc, x) => (acc * 257 + x) % 2147483647L)
      }
    }
    val texts = Seq("hello world", "aaaaaaaaaa", "spark shuffle join", "abc", "")
    val got = texts.toDF("t")
      .select(graft.functions.rolling_kgrams(col("t"), 4).as("h"))
      .as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, hs) =>
      assert(hs === direct(t, 4), s"mismatch for '$t'")
    }
    assert(got(3) === Seq.empty) // len 3 < k=4
    assert(got(4) === Seq.empty)
  }

  test("rolling fingerprints are content-anchored: shared substring, same hashes") {
    // the same long substring embedded at different offsets must select the
    // same fingerprint hashes in both docs (alignment independence)
    val core = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, s"XX $core YY"), (2L, s"completely different prefix $core"))
      .toDF("doc_id", "text")
    val fp = graft.ops.TextOps.rollingFingerprints(df, "doc_id", "text", k = 8, p = 4)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getAs[Long]("h")).toSet }
    val shared = byDoc(1L) intersect byDoc(2L)
    assert(shared.nonEmpty, "no shared fingerprints selected from a shared core")
    // every selected hash is ≡ 0 mod p
    assert(byDoc.values.flatten.forall(_ % 4 == 0))
  }

  // ----------------------------------------------------------- normalize_ts

  test("normalize_ts accepts every reference timestamp format branch") {
    // branches of sql/gold/create_uid_hourly_h3.sql:30-43
    val inputs = Seq(
      "2025-01-01 00:03:07",        // plain, space separator
      "2025-01-01T00:03:07",        // ISO T
      "2025-01-01T00:03:07Z",       // zulu suffix
      "2025-01-01T01:03:07+01:00",  // offset → same UTC instant
      "2025-01-01 00:03:07.123456", // fractional
      "notatime",                   // garbage → null
      null)                         // null → null
    val df = inputs.toDF("s").select(normalize_ts(col("s")).as("ts"))
    val got = df.select(unix_micros(col("ts"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val base = 1735689787000000L // 2025-01-01T00:03:07Z in epoch micros
    assert(got(0) === Some(base))
    assert(got(1) === Some(base))
    assert(got(2) === Some(base))
    assert(got(3) === Some(base))
    assert(got(4) === Some(base + 123456L))
    assert(got(5) === None)
    assert(got(6) === None)
  }

  test("image_dims recovers dimensions from REAL JDK-encoded PNG/JPEG/GIF bytes") {
    // ground truth from an independent encoder: javax.imageio ships with
    // the JDK, so these are genuine container files, not hand-typed hex
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK lacks $fmt writer")
      bos.toByteArray
    }
    val cases = Seq(
      ("png", 640, 480), ("png", 1, 1), ("png", 7, 30000),
      ("jpg", 320, 200), ("jpg", 16, 16),
      ("gif", 300, 200), ("gif", 1, 65535))
    val rows = cases.zipWithIndex.map { case ((fmt, w, h), i) =>
      (i.toLong, fmt, w.toLong, h.toLong, encode(fmt, w, h))
    }
    val df = rows.toDF("id", "fmt", "w", "h", "bytes")
    val got = graft.ops.Multimodal.imageDims(df, "id", "bytes")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { case (i, fmt, w, h, _) =>
      val expectFmt = if (fmt == "jpg") "jpeg" else fmt
      assert(got(i) === ((expectFmt, w, h)),
        s"case $i ($fmt ${w}x$h): got ${got(i)}")
    }
    // non-images and truncated headers parse to null format, the
    // quarantine predicate
    val junk = Seq(
      (100L, "junk".getBytes("UTF-8")),
      (101L, Array[Byte](0x89.toByte, 'P', 'N')),     // truncated PNG sig
      (102L, Array[Byte](0xff.toByte, 0xd8.toByte)),  // bare JPEG SOI
      (103L, Array.empty[Byte])).toDF("id", "bytes")
    val nulls = graft.ops.Multimodal.imageDims(junk, "id", "bytes").collect()
    assert(nulls.forall(_.isNullAt(1)), "unparseable bytes must yield null format")
  }

  test("wav_meta recovers stream parameters from REAL JDK-encoded WAV bytes") {
    // ground truth from javax.sound.sampled (stock JDK): genuine RIFF
    // containers with whatever chunk layout the JDK writer emits
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    def encode(rate: Float, bits: Int, ch: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, ch, true, false)
      val data = new Array[Byte](frames * ch * (bits / 8))
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val cases = Seq(
      (8000f, 16, 1, 100), (44100f, 16, 2, 441), (16000f, 8, 1, 1))
    val rows = cases.zipWithIndex.map { case ((r, b, c, f), i) =>
      (i.toLong, c.toLong, r.toLong, b.toLong, f.toLong, encode(r, b, c, f))
    }
    val got = graft.ops.Multimodal.wavMeta(
        rows.toDF("id", "ch", "rate", "bits", "frames", "bytes"), "id", "bytes")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.foreach { case (i, c, r, b, f, _) =>
      assert(got(i) === ((c, r, b, f)), s"case $i: got ${got(i)}")
    }
    // junk, truncated RIFF preambles, and a HOSTILE chunk size near 2^31
    // (would wrap an int cursor negative → out-of-bounds read) are all
    // null, never a throw — corrupt bytes are an expected input class
    val hostile = "RIFF0000WAVE".getBytes("UTF-8") ++
      "fmt ".getBytes("UTF-8") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte) ++
      new Array[Byte](24)
    val junk = Seq((9L, "RIFFxxxx".getBytes("UTF-8")),
      (10L, "not audio at all".getBytes("UTF-8")),
      (11L, hostile)).toDF("id", "bytes")
    assert(graft.ops.Multimodal.wavMeta(junk, "id", "bytes")
      .collect().forall(_.isNullAt(1)))
  }

  test("wav_meta rejects non-PCM formats — frames = dataSize/blockAlign is only right for PCM") {
    // a compressed or float WAV parsed as PCM would report a WRONG frame
    // count; the contract is null for anything that is not parseable PCM
    def wav(audioFormat: Int, fmtSize: Int = 16): Array[Byte] = {
      def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
      def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte)
      "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(fmtSize) ++
        (le16(audioFormat) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
          le16(2) ++ le16(16)).take(fmtSize) ++
        "data".getBytes ++ le32(32) ++ new Array[Byte](32)
    }
    val rows = Seq(
      (1L, wav(1)),            // PCM — the control, must parse
      (2L, wav(3)),            // IEEE float
      (3L, wav(2)),            // ADPCM
      (4L, wav(0xFFFE)),       // WAVE_FORMAT_EXTENSIBLE
      (5L, wav(1, fmtSize = 14))) // fmt chunk too short for PCM layout
      .toDF("id", "bytes")
    val got = graft.ops.Multimodal.wavMeta(rows, "id", "bytes")
      .select("id", "channels").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L), "audioFormat 1 with full PCM layout parses")
    Seq(2L, 3L, 4L, 5L).foreach(i =>
      assert(got(i), s"row $i (non-PCM / short fmt) must quarantine to null"))
  }

  test("image_dims JPEG walk: legal 0xFF fill bytes and EOI/SOS termination") {
    // T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a marker
    // byte — a walk that reads a fill byte as the marker misparses the
    // next 0xFF as a segment length. And reaching SOS/EOI without an SOF
    // means no parseable frame header: null, never a garbage read.
    def sof0(w: Int, h: Int) = Array[Byte](0xff.toByte, 0xc0.toByte,
      0, 17, 8, (h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
    val fill = Array.fill(3)(0xff.toByte)
    val cases = Seq(
      // fill bytes directly before the SOF marker byte
      (1L, soi ++ fill ++ Array(0xc0.toByte) ++ sof0(320, 200).drop(2),
        Some(("jpeg", 320L, 200L))),
      // a padded APP0 boundary, then a clean SOF
      (2L, soi ++ Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 0, 0) ++
        fill ++ Array(0xc0.toByte) ++ sof0(64, 32).drop(2),
        Some(("jpeg", 64L, 32L))),
      // EOI before any SOF — terminate, null
      (3L, soi ++ Array[Byte](0xff.toByte, 0xd9.toByte) ++ sof0(9, 9), None),
      // SOS before any SOF — entropy data follows, walk must stop
      (4L, soi ++ Array[Byte](0xff.toByte, 0xda.toByte, 0, 2) ++
        new Array[Byte](40), None),
      // corrupt zero segment length must not stall the walk
      (5L, soi ++ Array[Byte](0xff.toByte, 0xe0.toByte, 0, 0, 0, 0), None))
    val got = graft.ops.Multimodal.imageDims(
        cases.map(c => (c._1, c._2)).toDF("id", "bytes"), "id", "bytes")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getString(1), r.getLong(2), r.getLong(3))))).toMap
    cases.foreach { case (i, _, want) =>
      assert(got(i) === want, s"case $i: got ${got(i)}, want $want")
    }
  }

  test("mp4_meta walks ISO-BMFF boxes: v0/v1 layouts, largesize, audio-only, hostile sizes") {
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(tag: String, payload: Array[Byte]) =
      be32(payload.length + 8L) ++ tag.getBytes ++ payload
    def ftyp(brand: String) = box("ftyp", brand.getBytes ++ be32(0))
    def mvhd0(ts: Long, dur: Long) =
      box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur) ++
        new Array[Byte](80))
    def mvhd1(ts: Long, dur: Long) =
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(ts) ++ be64(dur) ++ new Array[Byte](80))
    def tkhd0(w: Long, h: Long) =
      box("tkhd", be32(7) ++ new Array[Byte](8) ++ be32(1) ++ be32(0) ++
        be32(0) ++ new Array[Byte](52) ++ be32(w << 16) ++ be32(h << 16))
    def tkhd1(w: Long, h: Long) =
      box("tkhd", Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++ be32(1) ++
        be32(0) ++ be64(0) ++ new Array[Byte](52) ++
        be32(w << 16) ++ be32(h << 16))
    val v0 = ftyp("isom") ++
      box("moov", mvhd0(600, 1234) ++ box("trak", tkhd0(640, 480)))
    val v1 = ftyp("mp42") ++
      box("moov", mvhd1(90000, 5000000L) ++ box("trak", tkhd1(1920, 1080)))
    // audio trak (0x0) FIRST, then the video trak — the walk must keep
    // looking past zero-extent traks
    val av = ftyp("avc1") ++ box("moov", mvhd0(44100, 88200) ++
      box("trak", tkhd0(0, 0)) ++ box("trak", tkhd0(320, 240)))
    // 64-bit largesize header on the moov box
    val moovP = mvhd0(600, 42) ++ box("trak", tkhd0(12, 34))
    val big = ftyp("isom") ++
      (be32(1) ++ "moov".getBytes ++ be64(moovP.length + 16L) ++ moovP)
    // hostile: a declared be32 size near 2^31 must walk off the end (null),
    // never wrap an int cursor negative
    val hostile = ftyp("isom") ++ be32(0x7ffffff8L) ++ "moov".getBytes
    // corrupt: a box smaller than its own header
    val tiny = ftyp("isom") ++ be32(4) ++ "moov".getBytes
    val noMoov = ftyp("isom")
    // interleaved free/skip boxes are legal anywhere (§4.3 note): between
    // top-level boxes AND between moov children — the walk must skip, not
    // quarantine
    val freeb = box("free", new Array[Byte](11))
    val padded = ftyp("isom") ++ freeb ++
      box("moov", freeb ++ mvhd0(600, 77) ++ box("skip", new Array[Byte](3)) ++
        box("trak", tkhd0(111, 222)) ++ freeb) ++ freeb
    val rows = Seq(
      (1L, v0, Some("mp4 isom 640 480 600 1234")),
      (2L, v1, Some("mp4 mp42 1920 1080 90000 5000000")),
      (3L, av, Some("mp4 avc1 320 240 44100 88200")),
      (4L, big, Some("mp4 isom 12 34 600 42")),
      (5L, hostile, None),
      (6L, tiny, None),
      (7L, noMoov, None),
      (8L, "not a video".getBytes("UTF-8"), None),
      (9L, Array.empty[Byte], None),
      (10L, padded, Some("mp4 isom 111 222 600 77")),
      // QuickTime's real 'qt  ' brand (trailing spaces by spec) and a
      // hostile control-byte brand: both sanitize to '_' instead of
      // shifting the space-delimited output's downstream split columns
      (11L, ftyp("qt  ") ++ box("moov", mvhd0(600, 9) ++
        box("trak", tkhd0(1, 2))), Some("mp4 qt__ 1 2 600 9")),
      (12L, (be32(16) ++ "ftyp".getBytes ++ Array[Byte](0x07, 'a', 'b', 0x7f.toByte) ++ be32(0)) ++
        box("moov", mvhd0(10, 1)), Some("mp4 _ab_ 0 0 10 1")))
    val got = rows.map(r => (r._1, r._2)).toDF("id", "bytes")
      .select(col("id"), graft.functions.mp4_meta(col("bytes")).as("m"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    rows.foreach { case (i, _, want) =>
      assert(got(i) === want, s"case $i: got ${got(i)}, want $want")
    }
  }

  // ----------------------------------------------------------- EntropyTerms

  test("entropy_terms kernel ≡ the explode-aggregate definition, code-point iteration") {
    def terms(s: String): (Long, Long) = {
      val r = graft.expressions.EntropyTerms
        .terms(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (r.getLong(0), r.getLong(1))
    }
    // "aab": counts {a:2, b:1} → t_sum = round(2·ln2·1e6) = 1386294
    assert(terms("aab") === ((3L, 1386294L)))
    assert(terms("") === ((0L, 0L)))
    // a surrogate pair is ONE code point (split("") has not cut pairs since Java 8)
    assert(terms(new String(Character.toChars(0x1F600)) * 2 + "x")
      === ((3L, 1386294L)))
    // non-ASCII BMP rides the spill map, same arithmetic
    assert(terms("ééx") === ((3L, 1386294L)))
    // SQL surface + null safety through the column path
    import spark.implicits._
    engine.GraftExtensions.register(spark)
    val row = Seq(Some("aab"), None).toDF("t")
      .selectExpr("entropy_terms(t) AS e").select("e.n_chars", "e.t_sum").collect()
    assert(row(0).getLong(0) === 3L && row(0).getLong(1) === 1386294L)
    assert(row(1).isNullAt(0))
  }

  // ----------------------------------------------------------- EntityDecode

  test("entity_decode: single pass, printable subset, boundary code points (eval + codegen)") {
    def decode(s: String): String = graft.expressions.EntityDecode
      .decode(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(decode("no refs here") === "no refs here") // '&'-free fast path
    // astral plane decodes to a surrogate PAIR in the output, one ref in
    assert(decode("&#x1F600;") === new String(Character.toChars(0x1F600)))
    // the last scalar value decodes; one past it stays literal (both radices)
    assert(decode("&#1114111;") === new String(Character.toChars(0x10FFFF)))
    assert(decode("&#1114112;") === "&#1114112;")
    assert(decode("&#x10FFFF;") === new String(Character.toChars(0x10FFFF)))
    assert(decode("&#x110000;") === "&#x110000;")
    // textual whitespace refs decode (the collapse absorbs them downstream)
    assert(decode("a&#9;b&#10;c") === "a\tb\nc")
    // apos: the XML/HTML5 predefined fifth, same pass
    assert(decode("it&apos;s &amp;apos;") === "it's &apos;")
    // malformed / unterminated / truncated forms all stay literal
    assert(decode("&lt &#; &#xZ; tail&") === "&lt &#; &#xZ; tail&")
    assert(decode("&#12345678;") === "&#12345678;") // over-long digit run
    // the codegen'd column path agrees with the direct kernel, and is null-safe
    import spark.implicits._
    val cases = Seq("x &#169; &quot;q&quot;", "A &amp;&amp; B", "&#x48;i")
    val viaCol = cases.toDF("t")
      .select(graft.functions.entity_decode(col("t"))).as[String].collect().toSeq
    assert(viaCol === cases.map(decode))
    assert(viaCol === Seq("x © \"q\"", "A && B", "Hi"))
    val nullRow = Seq(None: Option[String]).toDF("t")
      .select(graft.functions.entity_decode(col("t"))).first()
    assert(nullRow.isNullAt(0))
  }
}
