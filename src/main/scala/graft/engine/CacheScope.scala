package graft.engine

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Tracks the shared intermediates an operator persists so the CALLER can
  * actually release them. Spark's `CacheManager` holds a strong reference to
  * every persisted plan, so a `.persist` whose handle never escapes the
  * operator is a cached-RDD leak for the application lifetime — the
  * multi-consumer frames inside [[graft.ops.Dedup]], [[graft.ops.TextOps]]
  * and [[graft.ops.Indexing]] all need to outlive the operator call (the
  * caller's ACTION is what reads them), so the operator cannot unpersist
  * them itself. It registers them here instead.
  *
  * Lifecycle contract:
  *   - operators call `scope.persisted(df)` instead of `df.persist(...)`;
  *   - the default scope is [[CacheScope.global]] — identical behavior to
  *     before, released wholesale by [[CacheScope.releaseAll]] (Bench and
  *     Verify additionally call `spark.catalog.clearCache()`, which clears
  *     the same entries);
  *   - a caller that wants deterministic release passes its own scope, runs
  *     its action, then calls `release()`.
  */
final class CacheScope {
  private val frames = ArrayBuffer[Dataset[_]]()

  /** Persist `ds` (MEMORY_AND_DISK) and remember the handle. */
  def persisted[T](ds: Dataset[T]): Dataset[T] = synchronized {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    frames += p
    p
  }

  /** Unpersist every tracked frame (non-blocking) and forget the handles. */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }

  /** Number of currently tracked (not yet released) frames. */
  def trackedCount: Int = synchronized(frames.size)
}

object CacheScope {
  /** Application-lifetime scope — the default when a caller does not care
    * about cache release. Everything it accumulates goes away together via
    * [[releaseAll]] (or `spark.catalog.clearCache()`).
    */
  val global = new CacheScope

  /** Release every frame persisted under the default scope. */
  def releaseAll(): Unit = global.release()
}
