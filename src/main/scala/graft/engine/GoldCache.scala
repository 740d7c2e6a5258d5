package graft.engine

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Once-per-JVM gold-stage materialization — the Spark re-expression of the
  * reference's "refresh gold once, query it many times" lifecycle
  * (`pipelines/refresh_gold_tables.py:648-669`: every analysis query reads the
  * CTAS'd gold tables, never the raw silver scan).
  *
  * Declared queries share expensive upstream stages (the hourly rollup and the
  * pairs self-join feed six queries each). Recomputing that stage per query is
  * exactly what the reference's gold tables exist to avoid — so [[table]]
  * writes the stage to session-scoped temp parquet on first use and serves
  * every later consumer a plain parquet scan. Parquet roundtrips doubles,
  * timestamps and dates bit-exactly, so downstream results are unchanged.
  *
  * Scale: at 100 TB this is not an optimization but a requirement — the gold
  * stage is the contract boundary between the O(raw) ingest cost and the
  * O(gold) analysis cost. Keyed by (logical name, source dir); safe under
  * concurrent first use AND under RE-ENTRANT builds — a gold table's
  * `build` may read other gold tables (pairs reads the hourly rollup), so
  * the memoization must tolerate nesting. The original `computeIfAbsent`
  * implementation did not: ConcurrentHashMap forbids recursive updates and
  * detects them ONLY when the two keys hash to the same bin, so the bug was
  * invisible for every sfDir string shipped — until a scale-up directory's
  * key collided with its dependency's and warm_gold died with
  * `IllegalStateException: Recursive update` (found by the round-13 sf1e
  * scaling leg). Now: double-checked get + a PER-KEY object monitor (striped
  * via a ConcurrentHashMap of plain monitors — that map's computeIfAbsent
  * only allocates an Object, so it completes before `build` runs and can
  * never recurse). Per-key striping means a slow first-build of one
  * (name, srcDir) no longer serializes unrelated tables' first
  * materializations — e.g. the Bench warm-up across scale dirs. Nested
  * same-thread builds (pairs reads the hourly rollup) take the dependency's
  * DIFFERENT monitor; the stage graph is a DAG, so cross-thread lock cycles
  * are impossible. The temp root is deleted on JVM exit. Cache
  * lifecycle is filesystem-scoped, not Spark-cache-scoped, so
  * `spark.catalog.clearCache()` between queries cannot evict it.
  */
object GoldCache {

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft-gold-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(dir.toFile)))
    dir.toString
  }

  private val built = new ConcurrentHashMap[String, String]()

  private def delete(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete(); ()
  }

  private val monitors = new ConcurrentHashMap[String, Object]()

  /** Read-or-build: materialize `build` once per (name, srcDir) per JVM and
    * return a parquet-backed DataFrame over it. `build` is only evaluated on
    * first use; any later session reads the same files. `build` may itself
    * call [[table]] (gold stages compose) — see the reentrancy note above.
    */
  def table(spark: org.apache.spark.sql.SparkSession, name: String, srcDir: String)(
      build: => DataFrame): DataFrame = {
    val key = s"$name@$srcDir"
    val cached = built.get(key)
    val path =
      if (cached != null) cached
      else monitors.computeIfAbsent(key, _ => new Object).synchronized {
        val again = built.get(key)
        if (again != null) again
        else {
          val out = s"$root/$name-${Integer.toHexString(srcDir.hashCode)}"
          build.write.mode("overwrite").parquet(out)
          built.put(key, out)
          out
        }
      }
    spark.read.parquet(path)
  }
}
