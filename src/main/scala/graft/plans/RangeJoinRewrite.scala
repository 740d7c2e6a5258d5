package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a pure range-containment inner join
  * (`probe >= lo AND probe < hi`, no equi-key) into the binned equi-join of
  * [[graft.ops.RangeJoin]] — Spark's planner has no equi-key to hash on, so
  * it falls back to a nested-loop join that is quadratic in probes × ranges;
  * after the rewrite it plans a plain hash/sort-merge join on the bin id
  * with the original predicate kept as the residual filter.
  *
  * This is the (c)-tier extension path of SURVEY §7.4: a `Rule[LogicalPlan]`
  * registered through `SparkSessionExtensions` (`GraftExtensions`), so ANY
  * API that produces the range-join shape — `spark.sql`, the DataFrame DSL,
  * a BI tool — gets the scale-safe plan without calling the operator
  * explicitly.
  *
  * Activation: set `spark.graft.rangeJoinBinWidth` (a positive double, read
  * per query) to the expected interval length. Bin fanout per interval is
  * `ceil(len/width) + 1` — the same contract as `RangeJoin.binnedRangeJoin`.
  * The rule matches the two-conjunct containment shape with the probe on one
  * side and both bounds on the other (all numeric, all deterministic) — each
  * bound in either spelling (`x >= lo` / `lo <= x`, `x < hi` / `hi > x`) and
  * the conjuncts in either order; the rewritten join's condition carries a
  * leading bin equality, so it can never re-match in the fixed-point batch.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def width: Option[Double] =
    spark.conf.getOption("spark.graft.rangeJoinBinWidth")
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
      .filter(_ > 0)

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType] && e.deterministic

  private def binOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  /** probe from `probeSide`, both bounds from `rangeSide`. */
  private def containment(probe: Expression, lo: Expression, hi: Expression,
                          probeSide: LogicalPlan, rangeSide: LogicalPlan): Boolean =
    numeric(probe) && numeric(lo) && numeric(hi) &&
      probe.references.nonEmpty && lo.references.nonEmpty &&
      probe.references.subsetOf(probeSide.outputSet) &&
      lo.references.subsetOf(rangeSide.outputSet) &&
      hi.references.subsetOf(rangeSide.outputSet)

  /** `x >= lo` in either spelling (`x >= lo` / `lo <= x`) → (x, lo). */
  private object LowerBound {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(x, lo) => Some((x, lo))
      case LessThanOrEqual(lo, x) => Some((x, lo))
      case _ => None
    }
  }

  /** `x < hi` in either spelling (`x < hi` / `hi > x`) → (x, hi). */
  private object UpperBound {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(x, hi) => Some((x, hi))
      case GreaterThan(hi, x) => Some((x, hi))
      case _ => None
    }
  }

  /** The two conjuncts in either order, each bound in either spelling. */
  private object Containment {
    def unapply(e: Expression): Option[(Expression, Expression, Expression)] =
      e match {
        case And(LowerBound(x1, lo), UpperBound(x2, hi))
            if x1.semanticEquals(x2) => Some((x1, lo, hi))
        case And(UpperBound(x2, hi), LowerBound(x1, lo))
            if x1.semanticEquals(x2) => Some((x1, lo, hi))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      // probe on the left, interval on the right
      case j @ Join(left, right, Inner, Some(Containment(x, lo, hi)), hint)
          if containment(x, lo, hi, left, right) =>
        rewrite(j.condition.get, left, right, x, lo, hi, w, hint,
          probeLeft = true)
      // interval on the left, probe on the right
      case j @ Join(left, right, Inner, Some(Containment(x, lo, hi)), hint)
          if containment(x, lo, hi, right, left) =>
        rewrite(j.condition.get, right, left, x, lo, hi, w, hint,
          probeLeft = false)
    }
  }

  private def rewrite(origCond: Expression, probeSide: LogicalPlan,
                      rangeSide: LogicalPlan, probe: Expression, lo: Expression,
                      hi: Expression, w: Double,
                      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
                      probeLeft: Boolean): LogicalPlan = {
    val binP = Alias(binOf(probe, w), "__gbin_p")()
    val newProbe = Project(probeSide.output :+ binP, probeSide)
    // Sequence is TimeZoneAware — an undefined zone leaves it (and the whole
    // rewritten plan) unresolved, which the optimizer's validator rejects.
    // A malformed interval (hi < lo) must stay a benign no-match like the
    // original nested loop, not a Sequence boundary error: emit no bins.
    val binLo = binOf(lo, w)
    val binHi = binOf(hi, w)
    val bins = If(GreaterThanOrEqual(binHi, binLo),
      Sequence(binLo, binHi, Some(Literal(1L)),
        Some(spark.sessionState.conf.sessionLocalTimeZone)),
      Literal.create(Seq.empty[Long], org.apache.spark.sql.types.ArrayType(LongType)))
    val gen = Explode(bins)
    val elem = gen.elementSchema.head
    val binR = AttributeReference("__gbin_r", elem.dataType, elem.nullable)()
    val newRange = Generate(gen, Nil, outer = false, None, Seq(binR), rangeSide)
    val cond = And(EqualTo(binP.toAttribute, binR), origCond)
    val (l, r) = if (probeLeft) (newProbe, newRange) else (newRange, newProbe)
    val origOutput =
      if (probeLeft) probeSide.output ++ rangeSide.output
      else rangeSide.output ++ probeSide.output
    Project(origOutput, Join(l, r, Inner, Some(cond), hint))
  }
}
