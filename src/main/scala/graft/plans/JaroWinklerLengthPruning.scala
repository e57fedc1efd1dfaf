package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaroWinklerSim

/** Optimizer rule: strengthen high-threshold Jaro-Winkler filters with an
  * IMPLIED byte-length-ratio predicate, so cheap integer comparisons prune
  * candidate pairs before the O(|a|·|b|) scorer runs (and, unlike the
  * scorer, the length predicate can push further down — below the
  * pair-generating join once Catalyst splits the conjunction).
  *
  * Soundness (never changes results): with prefix scale 0.1 and cap 4,
  * `jw ≤ 0.6·jaro + 0.4` always (boost ≤ 0.4·(1−jaro); the unboosted case
  * is immediate). Matches are bounded by the shorter string,
  * `m ≤ min(|a|,|b|)`, so `jaro ≤ (min/|a| + min/|b| + 1)/3
  * ≤ (min/max + 2)/3`. Chaining: `jw ≥ t ⟹ min/max ≥ 5t − 4` — vacuous
  * at t ≤ 0.8 (the rule leaves those filters alone), ratio ≥ 0.5 at
  * t = 0.9, ≥ 0.75 at 0.95. The injected predicate relaxes the real-
  * arithmetic bound by one byte (`min ≥ r·max − 1`) so double rounding
  * can only keep a pair, never drop one.
  *
  * Idempotent by construction: the conjunct is skipped when an equivalent
  * one is already present (optimizer batches run to fixpoint). Registered
  * via [[graft.GraftExtensions]] (`injectOptimizerRule`); for a live
  * session use `spark.experimental.extraOptimizations`.
  */
object JaroWinklerLengthPruning extends Rule[LogicalPlan] {

  /** The two one-sided forms of min(|a|,|b|) >= r·max(|a|,|b|) − 1 over
    * octet_length (the scorer is byte-based, so byte lengths are the
    * tight measure). Emitted as SEPARATE conjuncts — a combined And would
    * be re-split by the next fixpoint pass and defeat the already-present
    * check. */
  private def lengthPreds(a: Expression, b: Expression, r: Double): Seq[Expression] = {
    def len(e: Expression) = Cast(OctetLength(e), DoubleType)
    def side(x: Expression, y: Expression) =
      GreaterThanOrEqual(len(x),
        Subtract(Multiply(Literal(r), len(y)), Literal(1.0)))
    Seq(side(a, b), side(b, a))
  }

  private def implied(conjunct: Expression): Seq[Expression] = {
    // jw(a,b) >= t in its four literal/order spellings; t must exceed 0.8
    // for the ratio bound 5t - 4 to prune anything
    val m = conjunct match {
      case GreaterThanOrEqual(JaroWinklerSim(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case GreaterThan(JaroWinklerSim(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case LessThanOrEqual(Literal(t: Double, DoubleType), JaroWinklerSim(a, b)) => Some((a, b, t))
      case LessThan(Literal(t: Double, DoubleType), JaroWinklerSim(a, b)) => Some((a, b, t))
      case _ => None
    }
    m.toSeq.collect { case (a, b, t) if t > 0.8 =>
      lengthPreds(a, b, 5.0 * t - 4.0) }.flatten
  }

  private def strengthen(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val additions = conjuncts.flatMap(implied)
      .filterNot(add => conjuncts.exists(_.semanticEquals(add)))
    // dedupe additions against each other too (a >= t AND a > t would
    // derive the same bound twice)
    val distinctAdds = additions.foldLeft(Seq.empty[Expression]) { (acc, e) =>
      if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }
    if (distinctAdds.isEmpty) None
    else Some((conjuncts ++ distinctAdds).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      strengthen(cond).map(Filter(_, child)).getOrElse(f)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isDefined =>
      // the scorer comparison often lives in the join condition by the
      // time extension rules run (filter-into-join already fired); the
      // single-side length conjuncts added here are then pushed below the
      // join by the same fixpoint batch
      strengthen(j.condition.get).map(c => j.copy(condition = Some(c)))
        .getOrElse(j)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
