package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: times stages of the hot queries and prints
  * formatted plans. Not part of the library (lives under tools/, added to
  * the build via Compile/unmanagedSourceDirectories? No — compiled ad hoc
  * by being placed in src; see usage in round logs).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val events = graft.engine.Tables.events(spark, sfDir)
    events.count() // warm session

    val hourly = graft.ops.CoMovement.hourlyRollup(events, "user_id", "ts", "value", 3)
    time("hourly only")(hourly.count())
    time("hourly again (warm)")(hourly.count())

    val h = hourly.select("uid", "dt", "hr", "cell")
    val a = h.toDF("uid_a", "dt", "hr", "cell")
    val b = h.toDF("uid_b", "dt", "hr", "cell")
    val pairHours = a.join(b, Seq("dt", "hr", "cell"))
      .filter(org.apache.spark.sql.functions.col("uid_a") <
        org.apache.spark.sql.functions.col("uid_b"))
    time("self-join only")(pairHours.count())

    val pairs = graft.ops.CoMovement.pairsDaily(hourly)
    time("pairsDaily full")(pairs.count())
    time("pairsDaily again (warm)")(pairs.count())

    println("\n=== pairsDaily formatted plan ===")
    pairs.explain("formatted")

    val ngram = graft.ops.Dedup.ngramJaccardPairs(
      graft.engine.Tables.documents(spark, sfDir), "doc_id", "text", 3, 0.5)
    time("dedup_ngram")(ngram.count())
    time("dedup_ngram warm")(ngram.count())

    val mh = graft.ops.Dedup.minhashLshPairs(
      graft.engine.Tables.documents(spark, sfDir), "doc_id", "text", 8, 2, 3)
    time("dedup_minhash")(mh.count())

    val topk = graft.ops.Similarity.cosineTopK(
      graft.engine.Tables.embeddings(spark, sfDir), "vec_id", "embedding", 5)
    time("embed_topk")(topk.count())
    spark.stop()
  }
}
