package graft

import org.apache.spark.sql.SparkSession

/** Crash-point rehearsal for the catalog-atomic compaction (a `main`,
  * spawned by `CompactCrashSpec` — the [[RetryRehearsal]] subprocess
  * pattern taken one step further: instead of killing task attempts it
  * kills the WHOLE JVM, `Runtime.halt`, at the two windows of
  * [[graft.ops.GoldPipeline.compactPartitionsCatalog]] whose guarantees
  * were argued in scaladoc but never exercised by an actual crash:
  *
  *   - `after_rewrite`: the fresh `__c<k>` sibling is fully written but
  *     the catalog still points at the old leaf. Claimed: readers see the
  *     OLD data (consistent, never torn); re-running maintenance converges
  *     and NEVER reuses the stranded `__c<k>` name; the stranded sibling
  *     is swept as an orphan exactly once.
  *   - `after_flip`: the catalog points at the new `__c<k>` but the old
  *     leaf has not been swept. Claimed: readers see the NEW (row-
  *     identical) data; the old leaf is swept exactly once; re-running
  *     maintenance is a no-op.
  *
  * Crash-survivable catalog state needs a metastore that outlives the
  * JVM, so every phase opens the SAME embedded-Derby-backed Hive
  * metastore under the work dir (phases run strictly sequentially — the
  * spec waits each subprocess out, so single-writer Derby is fine; this
  * is also the repo's only Hive-catalog coverage, a bonus: the atomic
  * ALTER ... SET LOCATION flip is proven on the catalog implementation a
  * production deployment would actually run).
  *
  * Phases (`args(0)`), all against `args(1)` = workDir:
  *   - `seed`: write a 2-partition × 12-file table, register it, emit the
  *     row digest.
  *   - `crash <boundary>`: install `Runtime.halt(13)` at the named
  *     boundary and start maintenance; the JVM must die there (exit 13 —
  *     asserted by the spec; reaching the end prints `halting:false` and
  *     exits 1).
  *   - `verify`: fresh JVM against the crashed state — read + digest
  *     (the torn-read check), re-run maintenance (convergence + the
  *     never-reuse-a-live-name check), sweep twice (exactly-once), read +
  *     digest again, re-run maintenance again (quiescence). Emits one
  *     `CRASHJSON` line per step for the spec.
  */
object CompactCrashRehearsal {

  val Table = "gold_crash_t"

  private def session(workDir: String): SparkSession = {
    System.setProperty("derby.system.home", workDir)
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-compact-crash")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$workDir/metastore_db;create=true")
      .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
      .config("spark.hadoop.hive.metastore.schema.verification", "false")
      .getOrCreate()
  }

  private def root(workDir: String) = s"$workDir/table"

  /** Registered location's leaf-dir name per partition spec, sorted. */
  private def locs(spark: SparkSession): Seq[String] = {
    val cat = spark.sharedState.externalCatalog
    cat.listPartitions("default", Table).map { p =>
      val leaf = new org.apache.hadoop.fs.Path(p.storage.locationUri.get).getName
      s"${p.spec.map { case (k, v) => s"$k=$v" }.mkString(",")}->$leaf"
    }.sorted
  }

  /** Non-hidden dirs currently on disk under the table root, sorted. */
  private def leaves(spark: SparkSession, workDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root(workDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).sorted.toSeq
  }

  // scalastyle:off println — the stdout CRASHJSON lines ARE the contract
  private def emit(tag: String, fields: (String, String)*): Unit =
    println(s"""CRASHJSON {"tag":"$tag",${fields.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}""")

  private def q(s: String) = s""""$s""""
  private def arr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")

  private def state(spark: SparkSession, workDir: String, tag: String): Unit = {
    val rows = spark.table(Table).collect()
    emit(tag, "rows" -> rows.length.toString,
      "digest" -> q(SpillRehearsal.digest(rows)),
      "locs" -> arr(locs(spark)),
      "leaves" -> arr(leaves(spark, workDir)))
  }

  def main(args: Array[String]): Unit = {
    val phase = args(0)
    val workDir = args(1)
    phase match {
      case "seed" =>
        val spark = session(workDir)
        import spark.implicits._
        val df = (0 until 600).map(i => (i, i % 2, s"v$i")).toDF("id", "dt", "s")
        df.repartition(12).write.mode("overwrite").partitionBy("dt")
          .parquet(root(workDir))
        spark.sql(s"DROP TABLE IF EXISTS $Table")
        ops.GoldPipeline.registerExternalTable(spark, Table, root(workDir))
        state(spark, workDir, "seed")
        spark.stop()

      case "crash" =>
        val boundary = args(2)
        val spark = session(workDir)
        ops.GoldPipeline.maintenanceBoundaryHook = b =>
          if (b == boundary) {
            emit("crash", "boundary" -> q(b), "halting" -> "true")
            System.out.flush()
            Runtime.getRuntime.halt(13) // a real crash: no shutdown hooks,
            // no committer cleanup, no metastore close
          }
        ops.GoldPipeline.compactPartitionsCatalog(
          spark, Table, targetBytes = 1L << 30, maxFiles = 8)
        emit("crash", "boundary" -> q(boundary), "halting" -> "false")
        spark.stop()
        sys.exit(1) // the halt must have fired; surviving is the failure

      case "verify" =>
        val spark = session(workDir)
        // 1. the torn-read claim: a fresh session against the crashed
        //    state reads a complete, duplicate-free table
        state(spark, workDir, "post_crash")
        // 2. convergence + never-reuse-a-live-name: maintenance re-run
        val compacted = ops.GoldPipeline.compactPartitionsCatalog(
          spark, Table, targetBytes = 1L << 30, maxFiles = 8)
        emit("remaint", "compacted" -> arr(compacted.map(_._1)))
        state(spark, workDir, "post_remaint")
        // 3. exactly-once sweep (grace collapsed for the test)
        val swept = ops.GoldPipeline.sweepOrphans(spark, Table, graceMs = 0L)
        val swept2 = ops.GoldPipeline.sweepOrphans(spark, Table, graceMs = 0L)
        emit("sweep",
          "swept" -> arr(swept.map(s => new org.apache.hadoop.fs.Path(s).getName)),
          "swept_again" -> arr(swept2.map(s => new org.apache.hadoop.fs.Path(s).getName)))
        state(spark, workDir, "post_sweep")
        // 4. quiescence: another maintenance pass finds nothing oversized
        val again = ops.GoldPipeline.compactPartitionsCatalog(
          spark, Table, targetBytes = 1L << 30, maxFiles = 8)
        emit("quiesce", "compacted" -> arr(again.map(_._1)))
        spark.stop()

      case other =>
        System.err.println(s"unknown phase $other")
        sys.exit(2)
    }
  }
}
