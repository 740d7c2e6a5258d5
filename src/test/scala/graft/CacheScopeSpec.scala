package graft

import org.apache.spark.storage.StorageLevel

import graft.engine.CacheScope
import graft.ops.{Dedup, Indexing, TextOps}

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "entirely different words live in this one here")
  ).toDF("doc_id", "text")

  test("persisted frames are tracked and release() unpersists them") {
    val scope = new CacheScope
    val df = docs
    val p = scope.persisted(df)
    assert(scope.trackedCount === 1)
    assert(p.storageLevel === StorageLevel.MEMORY_AND_DISK)
    scope.release()
    assert(scope.trackedCount === 0)
    assert(p.storageLevel === StorageLevel.NONE)
  }

  test("operator-internal persists are releasable by the caller") {
    spark.catalog.clearCache()
    // other suites' localCheckpoint RDDs survive clearCache — assert on the
    // DELTA this test introduces, not on global emptiness
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val scope = new CacheScope
    // each of the four formerly-leaking operators, with its action run
    assert(TextOps.bigramLmScore(docs, "doc_id", "text", scope).count() > 0)
    assert(Indexing.globalIndex(docs, "doc_id", scope = scope).count() === 3)
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      maxDocsPerShingle = 10, scope = scope).count() >= 0)
    assert(TextOps.fingerprintOverlapPairs(docs, "doc_id", "text",
      maxDocsPerHash = 10, scope = scope).count() >= 0)
    assert(scope.trackedCount >= 4, "every internal persist must be tracked")
    scope.release()
    assert(scope.trackedCount === 0)
    // nothing this scope persisted may survive at the session level
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"release() left cached RDDs behind: $leaked")
  }

  test("the default global scope is released wholesale by releaseAll") {
    spark.catalog.clearCache()
    CacheScope.releaseAll()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(Indexing.globalIndex(docs, "doc_id").count() === 3)
    assert(CacheScope.global.trackedCount >= 1)
    CacheScope.releaseAll()
    assert(CacheScope.global.trackedCount === 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"releaseAll() left cached RDDs behind: $leaked")
  }

  test("GoldCache.table survives a re-entrant build (gold stages compose)") {
    // pairs reads the hourly rollup THROUGH the cache, so build-inside-build
    // is the production shape. Under the original computeIfAbsent
    // memoization this threw IllegalStateException("Recursive update")
    // whenever the two keys happened to share a ConcurrentHashMap bin —
    // srcDir-string-dependent, found by the round-13 sf1e scaling leg.
    // Exercise MANY key pairs so bin collisions occur regardless of layout.
    (0 until 24).foreach { i =>
      val dir = s"/reentrant-probe-$i"
      val outer = engine.GoldCache.table(spark, s"outer$i", dir) {
        engine.GoldCache.table(spark, s"inner$i", dir) { docs }
          .groupBy("doc_id").count()
      }
      assert(outer.count() === 3, s"nested build $i must materialize")
      // both layers cached: re-reads serve parquet without re-building
      assert(engine.GoldCache.table(spark, s"inner$i", dir) {
        fail(s"inner$i must be served from cache") }.count() === 3)
    }
  }
}
