package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (the `Rule[LogicalPlan]` extension tier): derive the cheap
  * necessary condition of a bounded edit-distance predicate.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k` —
  * every insert/delete changes the length by one, substitutions not at all.
  * The guard costs two length reads and a compare; the DP it short-circuits
  * is O(|a|*|b|) per row. Conjoining the guard FIRST (And short-circuits in
  * generated code) turns a naive fuzzy filter from always-DP into
  * mostly-length-compare — the optimizer does mechanically what q41's
  * Pass-Join formulation does by hand, protecting the queries users write
  * naively. Null semantics are preserved: whenever the guard is false the
  * original predicate is false; when inputs are null both are null.
  *
  * The rule fires on Filter conditions and Join conditions, only for a
  * LITERAL integer bound and only for the un-thresholded 2-arg levenshtein
  * (the 3-arg form already carries its own early-exit bound inside the DP).
  * It is fixed-point-safe: a guard that is already a conjunct (semantically)
  * is never added twice — injected optimizer rules run in a fixed-point
  * batch, so an unguarded rewrite would grow the predicate every pass.
  *
  * Registration: `injectOptimizerRule` via [[graft.functions.GraftExtensions]]
  * (cluster deployment) or [[ensureRegistered]] (runtime, the
  * AsOfJoin.Strategy pattern).
  */
object LevenshteinGuard extends Rule[LogicalPlan] with PredicateHelper {

  private def guards(cond: Expression): Seq[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val derived = conjuncts.collect {
      case LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
          if lev.threshold.isEmpty =>
        LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)
      case LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
          if lev.threshold.isEmpty =>
        LessThan(Abs(Subtract(Length(lev.left), Length(lev.right))), k)
      case GreaterThanOrEqual(k @ Literal(_, IntegerType), lev: Levenshtein)
          if lev.threshold.isEmpty =>
        LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)
    }
    derived.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val gs = guards(cond)
      if (gs.isEmpty) f else Filter(And(gs.reduce(And), cond), child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val gs = guards(cond)
      if (gs.isEmpty) j else j.copy(condition = Some(And(gs.reduce(And), cond)))
  }

  /** Idempotent runtime registration (same pattern as AsOfJoin.Strategy). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(LevenshteinGuard))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinGuard
}
