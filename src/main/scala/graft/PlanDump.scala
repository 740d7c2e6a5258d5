package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev/measurement harness: dump `.explain("formatted")` for declared
  * queries to files — the optimization-round evidence trail
  * (`plans/r<N>/<query>_{before,after}.txt`). Mirrors Bench's session
  * config so the captured plans are the ones the bench actually runs
  * (same shuffle partitions, same master, same gold lifecycle).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, qcsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.warmGold(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          engine.CacheScope.releaseAll()
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
        case None => println(s"[plandump] UNKNOWN query: $name")
      }
    }
    spark.stop()
  }
}
