package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftExtensions

/** SQL-surface spec: the Catalyst expressions registered through the
  * extensions hook must produce identical results via `spark.sql` as via
  * the column facade ([[graft.functions]]), on both interpreted and
  * codegen paths (same Expression nodes → same plans).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("sql geo_cell matches the column function") {
    import org.apache.spark.sql.functions.col
    val df = Seq((40.7, -74.0), (51.5, -0.1), (-33.9, 151.2))
      .toDF("lat", "lon")
    df.createOrReplaceTempView("pts")
    val viaSql = spark.sql("SELECT geo_cell(lat, lon, 9) AS c FROM pts")
      .as[String].collect()
    val viaCol = df.select(graft.functions.geo_cell(col("lat"), col("lon"), 9).as("c"))
      .as[String].collect()
    assert(viaSql.toSeq === viaCol.toSeq)
    assert(viaSql.forall(_.length == 15))
  }

  test("sql stable_bucket matches the column function and the reference vectors") {
    val got = spark.sql("SELECT stable_bucket('366123456', 96) AS b")
      .as[Long].head()
    val viaCol = Seq("366123456").toDF("s")
      .select(graft.functions.stable_bucket(org.apache.spark.sql.functions.col("s"), 96))
      .as[Long].head()
    assert(got === viaCol)
    assert(got >= 0 && got < 96)
  }

  test("sql vec_dot is the strict in-order dot product") {
    val got = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(got === 32.0)
  }

  test("sql rolling_kgrams matches the column function") {
    val viaSql = spark.sql("SELECT rolling_kgrams('abcdefgh', 4) AS h")
      .as[Seq[Long]].head()
    val viaCol = Seq("abcdefgh").toDF("t")
      .select(graft.functions.rolling_kgrams(org.apache.spark.sql.functions.col("t"), 4))
      .as[Seq[Long]].head()
    assert(viaSql === viaCol)
    assert(viaSql.length === 5) // 8 - 4 + 1 k-grams
  }

  test("sql z_order matches the column function and the kernel") {
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql("SELECT z_order(5L, 3L) AS z").as[Long].head()
    val viaCol = Seq((5L, 3L)).toDF("x", "y")
      .select(graft.functions.z_order(col("x"), col("y")).as("z"))
      .as[Long].head()
    assert(viaSql === viaCol)
    assert(viaSql === graft.expressions.BitInterleave.morton(5L, 3L))
    // 5=101, 3=011 → interleaved x@even y@odd: 0b011011 = 27... verify by hand:
    // bits x: 1@0,0@1,1@2 → 1@0,0@2,1@4; bits y: 1@0,1@1,0@2 → 1@1,1@3,0@5
    assert(viaSql === ((1 << 0) | (1 << 1) | (1 << 3) | (1 << 4)))
  }

  test("sql image_dims / wav_meta match the column functions on real JDK-encoded bytes") {
    import org.apache.spark.sql.functions.col
    val img = new java.awt.image.BufferedImage(
      12, 34, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Seq(Tuple1(bos.toByteArray)).toDF("b").createOrReplaceTempView("imgs")
    assert(spark.sql("SELECT image_dims(b) AS d FROM imgs")
      .as[String].head() === "png 12 34")
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](20)), fmt, 10L)
    val wos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wos)
    Seq(Tuple1(wos.toByteArray)).toDF("b").createOrReplaceTempView("wavs")
    val viaSql = spark.sql("SELECT wav_meta(b) AS m FROM wavs").as[String].head()
    assert(viaSql === "wav 1 8000 16 10")
    val viaCol = Seq(Tuple1(wos.toByteArray)).toDF("b")
      .select(graft.functions.wav_meta(col("b"))).as[String].head()
    assert(viaSql === viaCol)
  }

  test("sql mp4_meta / winnow_min complete the SQL surface for the newest expressions") {
    import org.apache.spark.sql.functions.col
    // a minimal spec-shaped MP4: 16-byte ftyp + moov(mvhd v0 + trak/tkhd)
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val ftyp = be32(16) ++ "ftypisom".getBytes ++ be32(0)
    val mvhd = be32(108) ++ "mvhd".getBytes ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(1234) ++ new Array[Byte](80)
    val tkhd = be32(92) ++ "tkhd".getBytes ++ be32(7) ++ new Array[Byte](8) ++
      be32(1) ++ be32(0) ++ be32(1234) ++ new Array[Byte](52) ++
      be32(640L << 16) ++ be32(480L << 16)
    val trak = be32(100) ++ "trak".getBytes ++ tkhd
    val moov = be32(216) ++ "moov".getBytes ++ mvhd ++ trak
    Seq(Tuple1(ftyp ++ moov)).toDF("b").createOrReplaceTempView("vids")
    val viaSql = spark.sql("SELECT mp4_meta(b) AS m FROM vids").as[String].head()
    assert(viaSql === "mp4 isom 640 480 600 1234")
    val viaCol = Seq(Tuple1(ftyp ++ moov)).toDF("b")
      .select(graft.functions.mp4_meta(col("b"))).as[String].head()
    assert(viaSql === viaCol)
    Seq(Tuple1(Seq(5L, 3L, 4L, 1L, 2L))).toDF("a").createOrReplaceTempView("arrs")
    assert(spark.sql("SELECT winnow_min(a, 3) AS m FROM arrs")
      .as[Seq[Long]].head() === Seq(3L, 1L))
  }

  test("sql entity_decode matches the column facade and single-decodes") {
    import org.apache.spark.sql.functions.col
    Seq(Tuple1("5 &lt; 6 &#65;&#x42; &#38;amp; &amp;#65; &#7; tail"))
      .toDF("t").createOrReplaceTempView("ents")
    val viaSql = spark.sql("SELECT entity_decode(t) AS d FROM ents")
      .as[String].head()
    assert(viaSql === "5 < 6 AB &amp; &#65; &#7; tail",
      s"one decode per source reference, non-printables literal: '$viaSql'")
    val viaCol = Seq(Tuple1("5 &lt; 6 &#65;&#x42; &#38;amp; &amp;#65; &#7; tail"))
      .toDF("t").select(graft.functions.entity_decode(col("t"))).as[String].head()
    assert(viaSql === viaCol)
  }

  test("extensions class injects into a fresh session (spark.sql.extensions path)") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = fresh.sql("SELECT stable_bucket('x', 10) AS b").collect()(0).getLong(0)
      assert(got >= 0 && got < 10)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
