package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every declared query at `SPARK_GRAFT_SF_DIR`.
  *
  * Protocol: warm the session (parquet footers, codegen compiler), force the
  * shared gold-stage build (timed separately as `gold_build_sec` — the
  * refresh-once cost every later query amortizes, mirroring the reference's
  * gold refresh), then run each query `SPARK_GRAFT_BENCH_REPS` times (default
  * 3) and report the per-query minimum — the machine shows ±8 s/query
  * background variance, so single-shot numbers aren't trustworthy. A query
  * that throws is reported as value -1 plus an `"errors"` entry; it can never
  * record a plausible-looking wall time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (codegen compiler, parquet footers, scheduler) so
    // the first timed query isn't charged JVM startup. events needs its
    // dedicated loader (TIMESTAMP(NANOS) rejects the default vectorized read).
    engine.Tables.events(spark, sfDir).count()
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      engine.Tables.load(spark, sfDir, t).count()
    }
    val g0 = System.nanoTime()
    SparkEntry.warmGold(spark, sfDir)
    val goldSec = (System.nanoTime() - g0) / 1e9
    spark.catalog.clearCache()

    val errors = scala.collection.mutable.Map.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val dt =
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            None
          }
        spark.catalog.clearCache() // operators may persist shared frames
        dt
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString(""","errors":{""", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"gold_build_sec":$goldSec,"reps":$reps$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
