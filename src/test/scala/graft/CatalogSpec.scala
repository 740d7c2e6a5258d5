package graft

/** The SQL catalog bootstrap: after `registerViews`, a SQL-first user can
  * address every base table and gold stage by name and compose them — the
  * reference's own workflow (gold DDL + ad-hoc SELECTs) without the engine
  * API.
  */
class CatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registerViews exposes base tables and gold stages to spark.sql by name") {
    SparkEntry.registerViews(spark, sf)
    for (t <- Seq("lineitem", "events", "documents", "embeddings",
        "uid_hourly", "pairs_daily", "dup_clusters", "pair_max_gto"))
      assert(spark.catalog.tableExists(t), s"view $t must be registered")
    assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) > 0L)
    assert(spark.sql("SELECT count(*) FROM pairs_daily").head.getLong(0) > 0L)
  }

  test("views compose: ad-hoc SQL joins a gold stage back onto a base table") {
    SparkEntry.registerViews(spark, sf)
    // every pair member must exist in the hourly rollup it was derived
    // from — an integrity probe a reference user would write in plain SQL
    val orphans = spark.sql(
      """SELECT count(*) AS n
        |FROM pairs_daily p LEFT JOIN uid_hourly h ON h.uid = p.uid_a
        |WHERE h.uid IS NULL""".stripMargin).head.getLong(0)
    assert(orphans === 0L, "pairs must join back to their hourly source")
    val joined = spark.sql(
      """SELECT count(*) AS n
        |FROM pairs_daily p JOIN uid_hourly h
        |  ON h.uid = p.uid_a AND h.dt = p.day_date""".stripMargin)
      .head.getLong(0)
    assert(joined > 0L, "composed gold-to-gold SQL must produce rows")
  }
}
