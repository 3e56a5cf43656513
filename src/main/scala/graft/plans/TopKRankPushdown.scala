package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rank pushdown for `row_number() <= k` filters.
  *
  * The idiomatic Spark formulation of per-key top-k —
  * `withColumn("rn", row_number().over(Window.partitionBy(K).orderBy(O)))
  *  .filter($"rn" <= k)` — sorts EVERY row of every key partition before
  * the filter throws all but k of them away. This rule inserts the
  * bounded-heap [[TopKPerKey]] operator BELOW the window:
  *
  *   Filter(rn <= k, Window(row_number, K, O, child))
  *     ==> Filter(rn <= k, Window(row_number, K, O, TopKPerKey(K, O, k, child)))
  *
  * The window then ranks only keys·k surviving rows (a per-key O(n log k)
  * streaming pass replaces the full per-key sort), while the Filter and
  * Window stay in place so the output schema and rn values are
  * unchanged. Keys with ties at the k boundary keep row_number's
  * nondeterminism class: the heap keeps SOME k boundary rows, exactly as
  * the window sort keeps some tie order — deterministic queries must
  * order by a total key either way.
  *
  * Rewrite guards:
  *  - the Window computes EXACTLY ONE expression, a row_number with the
  *    default running frame (other window functions — sum, rank with
  *    PERCENT, lead/lag — would change value if rows were restricted);
  *  - the filter bounds that row_number attribute by a positive integer
  *    literal (`rn <= k`, `rn < k+1`, or `rn = 1`) among its conjuncts;
  *  - k is small enough that keys·k heap entries are a win (MaxK guard —
  *    beyond that the spillable window sort is the safer physical plan);
  *    key CARDINALITY needs no guard here: [[TopKPerKeyExec]] degrades
  *    to a spillable external sort when retained rows cross its
  *    per-partition budget (`spark.graft.topKPerKey.maxHeldRows`), so a
  *    near-unique key (row_number over l_orderkey on a 100 TB fact)
  *    costs one external sort — what the window would have paid anyway
  *    — instead of an OOM;
  *  - idempotence: the window's child is not already a TopKPerKey.
  *
  * Registered via GraftExtensions.injectOptimizerRule, so any
  * `spark.sql.extensions=graft.GraftExtensions` session — including
  * plain SQL users — gets the physical top-k operator from the standard
  * window idiom with zero API changes.
  */
object TopKRankPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Above this k the heap map's O(keys·k) memory loses to the window
    * sort's ability to spill; stay conservative.
    */
  private val MaxK = 10000

  private def boundOf(conjuncts: Seq[Expression], rn: Attribute): Option[Int] =
    conjuncts.collectFirst {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => v
      case LessThan(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => v - 1
      case EqualTo(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) && v == 1 => 1
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => v
      case GreaterThan(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => v - 1
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(
          Seq(a @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _))
        if part.nonEmpty && order.nonEmpty && !child.isInstanceOf[TopKPerKey] &&
          // topKPerKeyAuto's high-cardinality path REQUESTED the window
          // formulation — honor the opt-out instead of undoing it
          !a.metadata.contains(TopKPerKey.NoRewriteTag) =>
      val rnAttr = w.output.last
      boundOf(splitConjunctivePredicates(cond), rnAttr) match {
        case Some(k) if k >= 1 && k <= MaxK =>
          f.copy(child = w.copy(child = TopKPerKey(part, order, k, child)))
        case _ => f
      }
  }
}
