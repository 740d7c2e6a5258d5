package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.expressions.{BitInterleave, GeoCell, RollingKgramHash, StableHashBucket}
import graft.ops.Similarity
import graft.sources.ArchiveIndex

/** Property-based tests (SURVEY.md §5) over the pure kernels — no Spark
  * session needed, so these run in milliseconds and cover wide input space.
  */
object GraftProperties extends Properties("graft") {

  val lat: Gen[Double] = Gen.chooseNum(-90.0, 90.0)
  val lon: Gen[Double] = Gen.chooseNum(-180.0, 180.0)
  val res: Gen[Int] = Gen.chooseNum(0, 15)

  property("geocell: deterministic") = forAll(lat, lon, res) { (la, lo, r) =>
    GeoCell.cellId(la, lo, r) == GeoCell.cellId(la, lo, r)
  }

  property("geocell: always 15 lowercase hex chars") = forAll(lat, lon, res) {
    (la, lo, r) => GeoCell.cellId(la, lo, r).matches("[0-9a-f]{15}")
  }

  property("geocell: same cell ⇒ nearby (hex cell diameter bound)") =
    forAll(lat, lon, lat, lon, res) { (a1, o1, a2, o2, r) =>
      // cube rounding keeps |Δrf| < 2 and |Δqf| < 2 within one cell, so
      // |Δlat| < 3/scale and |Δlon| < 6/scale (loose affine-lattice bounds)
      val w = 1.0 / (1L << r)
      (GeoCell.cellId(a1, o1, r) != GeoCell.cellId(a2, o2, r)) ||
        (math.abs(a1 - a2) < 3 * w && math.abs(o1 - o2) < 6 * w)
    }

  property("geocell: decode inverts encode") = forAll(lat, lon, res) {
    (la, lo, r) =>
      val (q, rr) = GeoCell.axial(la, lo, r)
      GeoCell.decode(GeoCell.cellId(la, lo, r)) == ((r, q, rr))
  }

  property("geocell: neighbor adjacency is symmetric") = forAll(lat, lon, res) {
    (la, lo, r) =>
      val c = GeoCell.cellId(la, lo, r)
      GeoCell.neighbors(c).forall(n => GeoCell.neighbors(n).contains(c))
  }

  property("geocell: resolution is encoded (no cross-res collisions)") =
    forAll(lat, lon, res, res) { (la, lo, r1, r2) =>
      r1 == r2 || GeoCell.cellId(la, lo, r1) != GeoCell.cellId(la, lo, r2)
    }

  val key: Gen[String] = Gen.alphaNumStr.suchThat(_.nonEmpty)
  val buckets: Gen[Int] = Gen.chooseNum(1, 4096)

  property("stable bucket ∈ [0, n)") = forAll(key, buckets) { (s, n) =>
    val b = StableHashBucket.bucket(s, n)
    b >= 0 && b < n
  }

  property("stable bucket: deterministic across calls") = forAll(key, buckets) {
    (s, n) => StableHashBucket.bucket(s, n) == StableHashBucket.bucket(s, n)
  }

  // overlap coefficient model (the Column function mirrors this arithmetic)
  private def overlap(shared: Long, a: Long, b: Long): Option[Double] = {
    val m = math.min(a, b).toDouble
    if (m == 0) None else Some(shared / m)
  }

  val cnt: Gen[Long] = Gen.chooseNum(0L, 10000L)

  property("overlap ∈ [0,1] when shared ≤ min(a,b) > 0") =
    forAll(cnt, cnt) { (a, b) =>
      val m = math.min(a, b)
      m == 0L || {
        val sh = m / 2
        val o = overlap(sh, a, b).get
        o >= 0.0 && o <= 1.0
      }
    }

  property("subset track scores exactly 1.0 (README.md:164-168)") =
    forAll(Gen.chooseNum(1L, 10000L), Gen.chooseNum(0L, 10000L)) { (a, extra) =>
      overlap(a, a, a + extra).contains(1.0)
    }

  property("zero denominator yields null/none (NULLIF guard)") =
    forAll(cnt) { a => overlap(0, 0, a).isEmpty }

  property("archive candidates: one per day, inclusive bounds") =
    forAll(Gen.chooseNum(0L, 3650L), Gen.chooseNum(0L, 400L)) { (startOff, len) =>
      val from = LocalDate.of(2020, 1, 1).plusDays(startOff)
      val until = from.plusDays(len)
      val c = ArchiveIndex.candidates("x_%Y%m%d.zip", from, until)
      c.length == len + 1 && c.distinct.length == c.length
    }

  property("plane signs: ±1 only and deterministic") =
    forAll(Gen.chooseNum(1, 16), Gen.chooseNum(1, 128)) { (p, d) =>
      val s = Similarity.planeSigns(p, d)
      s.flatten.forall(v => v == 1.0 || v == -1.0) &&
        s.map(_.toSeq).toSeq == Similarity.planeSigns(p, d).map(_.toSeq).toSeq
    }

  // rolling kgram hash kernel (graft.expressions.RollingKgramHash)

  private def directKgramHash(bytes: Array[Byte], k: Int): Seq[Long] =
    (0 to bytes.length - k).map { j =>
      bytes.slice(j, j + k).foldLeft(0L)((acc, b) =>
        (acc * RollingKgramHash.Base + (b & 0xff)) % RollingKgramHash.Mod)
    }

  val text: Gen[String] = Gen.asciiPrintableStr
  val kLen: Gen[Int] = Gen.chooseNum(1, 12)

  property("rolling hash ≡ direct polynomial for every position") =
    forAll(text, kLen) { (s, k) =>
      val bytes = s.getBytes("UTF-8")
      RollingKgramHash.hashes(bytes, k).toSeq == directKgramHash(bytes, k)
    }

  property("rolling hash: values in [0, M); count = max(0, n-k+1)") =
    forAll(text, kLen) { (s, k) =>
      val hs = RollingKgramHash.hashes(s.getBytes("UTF-8"), k)
      hs.forall(h => h >= 0 && h < RollingKgramHash.Mod) &&
        hs.length == math.max(0, s.getBytes("UTF-8").length - k + 1)
    }

  property("rolling hash: equal k-grams hash equal (shift invariance)") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr, kLen) { (pre, core, k) =>
      core.getBytes("UTF-8").length < k || {
        val a = RollingKgramHash.hashes(core.getBytes("UTF-8"), k)
        val shifted = RollingKgramHash.hashes((pre + core).getBytes("UTF-8"), k)
          .drop(pre.getBytes("UTF-8").length)
        a.toSeq == shifted.toSeq
      }
    }

  property("planesFor: within bit bounds and monotone in n") =
    forAll(Gen.chooseNum(1L, Long.MaxValue / 2), Gen.chooseNum(1, 64)) { (n, t) =>
      val p = Similarity.planesFor(n, t)
      p >= 1 && p <= 62 && Similarity.planesFor(n * 2, t) >= p
    }

  // ---- SimHash pigeonhole-band recall guarantee --------------------------
  // simhashPairs splits the 64-bit signature into 4×16-bit bands (lo bits
  // 0-15, 16-31; hi bits 0-15, 16-31) and only band-collision pairs are
  // candidates. Recall guarantee: any two signatures within hamming
  // distance 3 MUST agree on at least one whole band (4 bands, ≤3 flips).
  private def bands(lo: Long, hi: Long): Seq[Long] =
    Seq(lo & 0xffffL, (lo >>> 16) & 0xffffL, hi & 0xffffL, (hi >>> 16) & 0xffffL)

  private val sig32: Gen[Long] = Gen.chooseNum(0L, (1L << 32) - 1)
  private val flips: Gen[List[Int]] =
    Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 63)))

  property("simhash bands: hamming<=3 always shares a band (pigeonhole)") =
    forAll(sig32, sig32, flips) { (lo, hi, fs) =>
      val (lo2, hi2) = fs.foldLeft((lo, hi)) { case ((l, h), j) =>
        if (j < 32) (l ^ (1L << j), h) else (l, h ^ (1L << (j - 32)))
      }
      bands(lo, hi).zip(bands(lo2, hi2)).exists { case (a, b) => a == b }
    }

  property("simhash bands: partition the signature exactly (no bit lost)") =
    forAll(sig32, sig32) { (lo, hi) =>
      val bs = bands(lo, hi)
      (bs(0) | (bs(1) << 16)) == lo && (bs(2) | (bs(3) << 16)) == hi
    }

  val u32: Gen[Long] = Gen.chooseNum(0L, 0xffffffffL)

  property("morton: interleave is lossless (compact inverts spread)") =
    forAll(u32, u32) { (x, y) =>
      val z = BitInterleave.morton(x, y)
      BitInterleave.compact(z) == x && BitInterleave.compact(z >>> 1) == y
    }

  property("morton: zero iff both inputs zero; sign bit is y's bit 31") =
    forAll(u32, u32) { (x, y) =>
      val z = BitInterleave.morton(x, y)
      ((z == 0) == (x == 0 && y == 0)) && ((z < 0) == (y >= (1L << 31)))
    }

  property("morton: monotone along each axis (locality within a row/column)") =
    // signed-long sort domain: keys below 2^31 (see BitInterleave doc)
    forAll(Gen.chooseNum(0L, 0x7ffffffeL), Gen.chooseNum(0L, 0x7fffffffL)) {
      (x, y) =>
        BitInterleave.morton(x, y) < BitInterleave.morton(x + 1, y) &&
          BitInterleave.morton(y, x) < BitInterleave.morton(y, x + 1)
    }

  // SpaceSaving is a pure kernel (reduce/merge/finish never touch Spark), so
  // its guarantees get the wide-input treatment: any stream, any split into
  // chunks, any left-fold merge tree.
  private val ssK = 4
  private val ssStream: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.const("hot"), 2 -> Gen.const("warm"),
      3 -> Gen.oneOf((1 to 20).map(i => s"cold$i"))))

  property("spacesaving: est>=true>=est-err and n/k hitters survive any split") =
    forAll(ssStream, Gen.chooseNum(1, 6)) { (xs, parts) =>
      val ss = new graft.ops.SpaceSaving(ssK)
      val chunkSize = math.max(1, (xs.size + parts - 1) / parts)
      val bufs = xs.grouped(chunkSize).map(_.foldLeft(ss.zero)(ss.reduce))
      val out = ss.finish(bufs.foldLeft(ss.zero)(ss.merge))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      out.size <= ssK &&
        out.forall { h =>
          val t = truth.getOrElse(h.item, 0L)
          h.est >= t && h.est - h.err <= t
        } &&
        truth.forall { case (item, c) =>
          c <= n / ssK || out.exists(_.item == item)
        }
    }

  property("spacesaving: below capacity the summary is exact") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "d"))) { xs =>
      val ss = new graft.ops.SpaceSaving(4) // keyspace fits: no eviction ever
      val out = ss.finish(xs.foldLeft(ss.zero)(ss.reduce))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      out.size == truth.size &&
        out.forall(h => truth(h.item) == h.est && h.err == 0L)
    }

  // ---- binary-header parsers vs the JDK's own encoders -------------------
  // every (w, h) the JDK can encode must round-trip through the pure
  // byte-arithmetic parsers — an independent-implementation property, not
  // a fixture check

  private val dim: Gen[Int] = Gen.chooseNum(1, 4096)

  property("image_dims: JDK png/gif/jpg round-trip at any dimensions") =
    forAll(dim, dim, Gen.oneOf("png", "gif", "jpg")) { (w, h, fmt) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val expectFmt = if (fmt == "jpg") "jpeg" else fmt
      val got = graft.expressions.ImageDims.dims(bos.toByteArray)
      got != null && got.toString == s"$expectFmt $w $h"
    }

  property("wav_meta: JDK wav round-trip over rates/depths/channels/frames") =
    forAll(Gen.oneOf(8000, 16000, 22050, 44100), Gen.oneOf(8, 16),
      Gen.oneOf(1, 2), Gen.chooseNum(1, 2000)) { (rate, bits, ch, frames) =>
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, bits, ch, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](frames * ch * (bits / 8))),
        fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val got = graft.expressions.WavMeta.meta(bos.toByteArray)
      got != null && got.toString == s"wav $ch $rate $bits $frames"
    }
}
