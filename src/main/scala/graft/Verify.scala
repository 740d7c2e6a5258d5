package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // lets Tables.events read legacy TIMESTAMP(NANOS) testdata as raw
      // longs; harmless when the files carry MICROS (round 7+)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q1,q2 dumps just those queries — the targeted
    // iteration loop; the driver never sets it, so rounds dump everything
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // hang protection: one pathological query must cost its own row, never
    // the whole dump (exceptions were already guarded; timeouts were not)
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "900").toLong
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      try {
        engine.Watchdog.run(spark, name, timeoutSec) {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } match {
          case Left(reason) =>
            failed += name
            System.err.println(s"[verify] $name failed: $reason")
          case Right(_) => ()
        }
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // operators may persist shared frames
      // also drop the CacheScope HANDLES: clearCache unpersists, but the
      // global scope's buffer would otherwise retain every query's plan
      // objects for the whole 150-query dump
      engine.CacheScope.releaseAll()
    }
    // loud summary on stdout; exit code stays 0 so the per-query dumps that
    // DID succeed still reach the driver compare (it records the missing
    // parquet dirs as per-query errors)
    if (failed.nonEmpty)
      println(s"[verify] ${failed.size}/${selected.size} queries FAILED: " +
        failed.sorted.mkString(", "))
    else
      println(s"[verify] all ${selected.size} queries dumped")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracleSelected = only match {
      case Some(names) => SparkEntry.oracleSql.filter { case (n, _) => names(n) }
      case None => SparkEntry.oracleSql
    }
    val json = oracleSelected
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
