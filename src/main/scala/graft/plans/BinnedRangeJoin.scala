package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, TimestampType}

/** Optimizer rule: rewrite point-in-interval joins to binned equi-joins.
  *
  * A join whose only condition is `point BETWEEN lo AND hi` has no equi
  * key, so Spark plans a BroadcastNestedLoopJoin — every probe row is
  * compared against every interval, O(n·m), catastrophic at 100 TB.
  * The standard scale rewrite (implemented by hand in q66) bins the
  * domain with a fixed width W:
  *
  *   Join(L, R, p >= lo AND p < hi)
  *     ==> Project(origOutput,
  *           Join(L + bin(p),
  *                Generate(explode(sequence(bin(lo), bin(hi))), R),
  *                bin(p) = binExploded AND <original condition>))
  *
  * Every interval covers (hi-lo)/W + 1 bins, so the exploded right side
  * grows by that factor, but the join becomes a hash equi-join on the
  * bin id: each probe row meets only the intervals overlapping its own
  * bin, and the original predicate stays as an exact residual. Wrong
  * bin width degrades performance, never correctness.
  *
  * Bins are floor(x / W) computed in exact integer arithmetic
  * ((x - pmod(x, W)) div W — truncating div on an exact multiple, so
  * negatives bin correctly), on the microsecond line for timestamps and
  * the raw value for integral columns.
  *
  * The rule fires only when `spark.graft.rangeJoin.binWidth` is set
  * positive (microseconds for timestamp points): W must match the
  * workload's interval length, which only the user knows — a width far
  * below the interval span would explode each interval into thousands
  * of bins. Guards:
  *  - inner join, with a non-empty condition;
  *  - no existing equi conjunct (that also makes the rewrite
  *    idempotent: the rewritten join HAS one);
  *  - lower and upper bounds on the SAME point expression, point and
  *    bounds on opposite sides of the join (either orientation);
  *  - all three expressions timestamp or integral, and deterministic.
  */
object BinnedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.binWidth"

  /** point-side expr, lower bound, upper bound — all already
    * side-checked; `pointOnLeft` records the orientation.
    */
  private case class IntervalCond(point: Expression, lo: Expression,
                                  hi: Expression, pointOnLeft: Boolean)

  private def sideOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  private def supported(e: Expression): Boolean = e.dataType match {
    case TimestampType | LongType | IntegerType => e.deterministic
    case _ => false
  }

  /** Normalize a comparison into (smaller, larger, isLowerBoundOnLeft):
    * a >= b  ==>  b <= a.
    */
  private def asLower(c: Expression): Option[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case GreaterThan(p, lo) => Some((p, lo))
    case LessThanOrEqual(lo, p) => Some((p, lo))
    case LessThan(lo, p) => Some((p, lo))
    case _ => None
  }
  private def asUpper(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(p, hi) => Some((p, hi))
    case LessThan(p, hi) => Some((p, hi))
    case GreaterThanOrEqual(hi, p) => Some((p, hi))
    case GreaterThan(hi, p) => Some((p, hi))
    case _ => None
  }

  private def findInterval(conjuncts: Seq[Expression], left: LogicalPlan,
                           right: LogicalPlan): Option[IntervalCond] = {
    val lowers = conjuncts.flatMap(asLower)
    val uppers = conjuncts.flatMap(asUpper)
    (for {
      (p1, lo) <- lowers.iterator
      (p2, hi) <- uppers.iterator
      if p1.semanticEquals(p2) && supported(p1) && supported(lo) && supported(hi)
      pSide <- sideOf(p1, left, right)
      loSide <- sideOf(lo, left, right)
      hiSide <- sideOf(hi, left, right)
      if loSide == hiSide && loSide != pSide
    } yield IntervalCond(p1, lo, hi, pointOnLeft = pSide)).nextOption()
  }

  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
          yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) =>
        (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
          yield sa != sb).getOrElse(false)
      case _ => false
    }

  /** x on its integer line: micros for timestamps, raw for ints. */
  private def toLine(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case LongType => e
    case IntegerType => Cast(e, LongType)
  }

  /** floor(x / W) in exact integer ops: (x - pmod(x, W)) div W. */
  private def bin(e: Expression, w: Long): Expression = {
    val x = toLine(e)
    val width = Literal(w, LongType)
    IntegralDivide(Subtract(x, Pmod(x, width)), width)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && left.resolved && right.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else findInterval(conjuncts, left, right) match {
          case None => j
          case Some(ic) =>
            val (pointPlan, intervalPlan) =
              if (ic.pointOnLeft) (left, right) else (right, left)
            // point side: one bin column
            val pBin = Alias(bin(ic.point, width), "graft_bin_p")()
            val pointProj = Project(pointPlan.output :+ pBin, pointPlan)
            // interval side: explode the covered bin range. Sequence is
            // TimeZoneAware — without a zone the new node is unresolved
            // and the optimizer rejects the whole rewrite. An inverted
            // interval (hi < lo — sentinel or glitch row) must produce
            // NO bins, not a Sequence boundary crash: the pre-rewrite
            // nested loop matched nothing for such rows, and a rewrite
            // may not turn an empty result into an error.
            val binLo = bin(ic.lo, width)
            val binHi = bin(ic.hi, width)
            val seqExpr = If(LessThanOrEqual(binLo, binHi),
              Sequence(binLo, binHi, Some(Literal(1L, LongType)))
                .withTimeZone(conf.sessionLocalTimeZone),
              Literal.create(Array.empty[Long], ArrayType(LongType)))
            val bins = Alias(seqExpr, "graft_bins")()
            val seqProj = Project(intervalPlan.output :+ bins, intervalPlan)
            val binAttr = AttributeReference("graft_bin_i", LongType,
              nullable = false)()
            val gen = Generate(Explode(bins.toAttribute),
              unrequiredChildIndex = Seq(seqProj.output.length - 1),
              outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = seqProj)
            val equi = EqualTo(pBin.toAttribute, binAttr)
            val (newLeft, newRight) =
              if (ic.pointOnLeft) (pointProj, gen) else (gen, pointProj)
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(And(equi, cond)), hint))
        }
    }
  }
}
