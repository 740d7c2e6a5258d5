package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and catalyst Expressions.
  *
  * Spark 4 Columns wrap ColumnNodes, not Expressions, and the converter
  * (`ExpressionUtils`) is `private[sql]` — so this one file lives under the
  * `org.apache.spark.sql` namespace to reach it. Everything else in the
  * engine stays in `graft.*` against public API only.
  */
object bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Per-session function registration (`SparkSession.sessionState` is
    * `private[sql]` too) — the live-session form of the extensions hook.
    */
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Drain the async listener bus so task-metric totals (e.g. spill bytes
    * accumulated by a SparkListener) are complete before reading them —
    * `SparkContext.listenerBus` is `private[spark]`.
    */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Sum `ObjectHashAggregateExec`'s "number of sort fallback tasks"
    * metric across an EXECUTED plan, unwrapping the AQE root and
    * materialized query stages (both live in the `private[sql]`-adjacent
    * `execution.adaptive` package, so the walk lives here). Evidence
    * counter for the spill rehearsal: a typed-Aggregator digest equality
    * is vacuous unless the sort-based fallback actually engaged.
    */
  def objectAggFallbackTasks(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    def walk(p: SparkPlan): Long = {
      val self = p match {
        case o: ObjectHashAggregateExec =>
          o.metrics.get("numTasksFallBacked").map(_.value).getOrElse(0L)
        case _ => 0L
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(walk).sum
    }
    walk(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan)
  }

  /** `SerializableConfiguration` is `private[spark]`; sources broadcast ONE
    * copy of the Hadoop conf instead of shipping it inside every partition.
    */
  type SerConf = org.apache.spark.util.SerializableConfiguration
  def serializableConf(c: org.apache.hadoop.conf.Configuration): SerConf =
    new org.apache.spark.util.SerializableConfiguration(c)

  /** Eager lineage truncation WITHOUT the constraint rewrite — the
    * iterative-loop workhorse `Dataset.localCheckpoint` cannot be.
    *
    * Spark 4's `Dataset.checkpoint` path ends in
    * `LogicalRDD.rewriteStatsAndConstraints`, which rebuilds the new leaf's
    * constraint set from the ORIGINAL plan's. In a fixpoint loop whose
    * per-round plan references the carried frame twice (min-label
    * propagation, k-core peeling: both join the previous round's frame on
    * two sides), the rewritten constraint set roughly DOUBLES per
    * checkpoint generation — by round ~30 the driver spends minutes per
    * round canonicalizing ExpressionSets inside the stats visitor, single-
    * threaded, while every executor idles. Observed: a 40-round peel went
    * from unbounded (>10 min, driver-bound) to seconds with this helper.
    *
    * Same materialization contract as `localCheckpoint(eager = true)`:
    * compute once (rows COPIED before caching — `toRdd` reuses UnsafeRow
    * buffers, the classic pitfall), truncate RDD lineage, return a frame
    * whose plan is a bare `LogicalRDD` leaf. Constraints are dropped
    * (downstream rounds never benefit from the carried frame's inferred
    * predicates — they re-filter anyway), but STATS are kept, rebuilt
    * from the materialized row count: without them the leaf defaults to
    * `defaultSizeInBytes` = huge, every later join of the (small) carried
    * frame stops broadcasting, and the final declared plan trades its
    * broadcast joins for shuffle joins — a measured 1 → 4 live-exchange
    * regression on the k-core output plan.
    */
  def truncated(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
    import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    val qe = classic.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val n = rdd.count() // eager: materialize + finalize the truncation now
    // keep the PHYSICAL output partitioning/ordering on the leaf, exactly
    // as Dataset.checkpoint does (read AFTER the count, so AQE's final
    // plan is what we capture): a per-round frame usually comes out of a
    // groupBy/join hash-partitioned on the loop key, and the next round's
    // join reuses that exchange-free — dropping it re-shuffled both sides
    // every round (pair_components measured 1.5 s → 3.0 s on exactly this)
    // unwrap the AQE root: AdaptiveSparkPlanExec itself reports
    // UnknownPartitioning — the final result stage (available once the
    // count above has executed it) carries the real one, typically a
    // CoalescedHashPartitioning that still satisfies the loop key's
    // clustered distribution
    val exec = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val logicalOut = qe.analyzed.output
    val attrMap: Map[Attribute, Attribute] = exec.output.zip(logicalOut)
      .filter { case (p, l) => p.exprId != l.exprId }.toMap
    def rebase(e: Expression): Expression =
      if (attrMap.isEmpty) e
      else e.transform { case a: Attribute => attrMap.getOrElse(a, a) }
    @annotation.tailrec
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case pc: PartitioningCollection => firstLeaf(pc.partitionings.head)
      case other => other
    }
    // AQE usually coalesces a small frame's shuffle: the result is a
    // CoalescedHashPartitioning the STATIC planner can't match against a
    // plain hash requirement, and claiming the underlying hash would be
    // WRONG once buckets were actually merged (key→partition is no longer
    // hash(k) % n). Truthful ladder: one partition ⟹ SinglePartition
    // (satisfies everything); identity coalescing ⟹ the underlying
    // HashPartitioning; real coalescing ⟹ keep the coalesced form (an
    // extra exchange at worst, never a wrong plan).
    val nParts = rdd.getNumPartitions
    val part0 = firstLeaf(exec.outputPartitioning) match {
      case c: org.apache.spark.sql.catalyst.plans.physical.CoalescedHashPartitioning
        if c.from.numPartitions == nParts => c.from
      case p => p
    }
    val part =
      if (nParts == 0) // empty frame: claim nothing rather than a layout
        org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0)
      else if (nParts == 1)
        org.apache.spark.sql.catalyst.plans.physical.SinglePartition
      else part0 match {
        case e: Expression => rebase(e).asInstanceOf[Partitioning]
        case p => p
      }
    val ord = exec.outputOrdering.map(so =>
      rebase(so).asInstanceOf[org.apache.spark.sql.catalyst.expressions.SortOrder])
    val sizeEst = BigInt(n).max(1) * (df.schema.defaultSize + 8)
    val leaf = org.apache.spark.sql.execution.LogicalRDD(
      logicalOut, rdd, part, ord)(spark,
      Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = sizeEst, rowCount = Some(BigInt(n)))),
      None)
    org.apache.spark.sql.classic.Dataset.ofRows(spark, leaf)
  }
}
