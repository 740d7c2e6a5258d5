package graft

import org.apache.spark.sql.functions._

import graft.ops.CurationPipeline

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // long enough for shingles, has "the" (stopword gate), near-zero punct
  private val good =
    "the quick brown fox jumps over the lazy dog and runs through the field"

  test("curate: every stage drops its doc, precedence holds, survivors redacted") {
    val docs = Seq(
      (1L, good),
      (2L, "  the quick   brown fox jumps over the lazy dog and runs through the field "), // = doc 1 after normalize
      (3L, "a ship sails into the harbor at dawn and the crew is unloading cargo tonight"),
      (4L, "a ship sails into the harbor at dawn and the crew is unloading cargo tomorrow"),
      (5L, "hi"),                // < 5 tokens -> quality
      (6L, "the secret eval answer is forty two and the rest of this text is fine"),
      (7L, "write to bob@example.com about the plan and the schedule for today")
    ).toDF("doc_id", "text")
    val evalSet = Seq("the secret eval answer is forty two exactly").toDF("text")
    val scope = new graft.engine.CacheScope
    val out = CurationPipeline.curate(docs, "doc_id", "text", Some(evalSet),
        scope = scope)
      .orderBy("doc_id").collect()
    scope.release()
    val stage = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(stage(1L) === null, "the canonical original survives")
    assert(stage(2L) === "exact_dup",
      "whitespace-variant copy must fall to EXACT dedup (normalize ran first)")
    assert(stage(3L) === null, "cluster canonical survives")
    assert(stage(4L) === "near_dup", "non-canonical cluster member drops")
    assert(stage(5L) === "quality")
    assert(stage(6L) === "contaminated")
    assert(stage(7L) === null)
    val kept = out.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(Seq(1L, 3L, 7L).forall(kept) && Seq(2L, 4L, 5L, 6L).forall(!kept(_)))
    val doc7 = out.find(_.getLong(0) == 7L).get.getString(1)
    assert(doc7.contains("[EMAIL]") && !doc7.contains("bob@example.com"),
      s"survivor text must be redacted: $doc7")
  }

  test("curate without an eval set: contamination gate reports no drops") {
    val docs = Seq(
      (1L, good),
      (2L, good + " with a different ending sentence entirely today")
    ).toDF("doc_id", "text")
    val scope = new graft.engine.CacheScope
    val out = CurationPipeline.curate(docs, "doc_id", "text", None, scope = scope)
      .collect()
    scope.release()
    assert(out.forall(r => r.isNullAt(2) || r.getString(2) != "contaminated"))
  }

  test("curate: injected candidate pairs reproduce the self-computed funnel") {
    val docs = Seq(
      (1L, good),
      (2L, "a ship sails into the harbor at dawn and the crew is unloading cargo tonight"),
      (3L, "a ship sails into the harbor at dawn and the crew is unloading cargo tomorrow"),
      (4L, "hi")
    ).toDF("doc_id", "text")
    val s1 = new graft.engine.CacheScope
    val s2 = new graft.engine.CacheScope
    val self = CurationPipeline.curate(docs, "doc_id", "text", None, scope = s1)
      .orderBy("doc_id").collect().toSeq
    // the standing dedup service's pair table, computed over the same
    // normalization — injecting it must not change a single row
    val pairs = graft.ops.Dedup.minhashLshPairs(
      docs.select(col("doc_id"), graft.ops.TextOps.normalizeText(col("text")).as("text")),
      "doc_id", "text", scope = s2)
    val injected = CurationPipeline.curate(docs, "doc_id", "text", None,
        candidatePairs = Some(pairs), scope = s2)
      .orderBy("doc_id").collect().toSeq
    s1.release(); s2.release()
    assert(self === injected)
  }

  test("report: the funnel is a single groupBy over the annotated frame") {
    val docs = Seq(
      (1L, good), (2L, good), (3L, "hi")
    ).toDF("doc_id", "text")
    val scope = new graft.engine.CacheScope
    val rep = CurationPipeline.report(
        CurationPipeline.curate(docs, "doc_id", "text", None, scope = scope))
      .collect().map(r => (if (r.isNullAt(0)) "KEPT" else r.getString(0)) ->
        r.getLong(1)).toMap
    scope.release()
    assert(rep === Map("KEPT" -> 1L, "exact_dup" -> 1L, "quality" -> 1L))
  }
}
