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
