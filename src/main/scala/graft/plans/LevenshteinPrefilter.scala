package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: guard bounded edit-distance predicates with a
  * length-difference prefilter.
  *
  * `levenshtein(a, b) <= k` costs O(|a|·|b|) per pair; but the distance is
  * lower-bounded by `abs(length(a) - length(b))`, a constant-time check. The
  * rule rewrites every conjunct of that shape (in `Filter` conditions and
  * `Join` conditions) to
  * `abs(length(a) - length(b)) <= k AND levenshtein(a, b) <= k` — the `And`
  * short-circuits left-to-right in codegen, so pairs whose lengths already
  * rule them out never run the dynamic program. On a fuzzy-dedup pair join
  * this is the difference between scoring every candidate and scoring the
  * length-plausible fraction.
  *
  * Soundness: `lev(a,b) >= abs(len(a)-len(b))` always (each unmatched
  * length unit costs >= 1 edit), so the added conjunct never drops a
  * qualifying row; null inputs null out both conjuncts identically. The
  * 3-arg banded form `levenshtein(a, b, k)` is left alone — it already
  * short-circuits internally.
  *
  * Idempotent (required — it runs inside a fixed-point batch): the conjunct
  * is only added when no semantically-equal conjunct is present.
  *
  * Injection: `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * session-side via [[graft.functions.GraftFunctions.registerOptimizations]].
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** Extract (left, right, k) from a bounded edit-distance conjunct —
    * 2-arg `levenshtein` or the engine's full `damerau_levenshtein`
    * ([[graft.functions.DamerauLevenshtein]]). The length lower bound
    * holds for BOTH metrics: a transposition changes no lengths, so
    * `dl(a,b) >= abs(len(a)-len(b))` by the same unit-cost argument.
    */
  private def boundOf(e: Expression): Option[(Expression, Expression, Expression)] =
    e match {
      case LessThanOrEqual(lev: Levenshtein, k: Literal) if lev.children.size == 2 =>
        Some((lev.children(0), lev.children(1), k))
      case LessThan(lev: Levenshtein, k: Literal) if lev.children.size == 2 =>
        Some((lev.children(0), lev.children(1), k))
      case LessThanOrEqual(dl: graft.functions.DamerauLevenshtein, k: Literal) =>
        Some((dl.left, dl.right, k))
      case LessThan(dl: graft.functions.DamerauLevenshtein, k: Literal) =>
        Some((dl.left, dl.right, k))
      case _ => None
    }

  /** `abs(length(l) - length(r)) <= k` — valid for both `<= k` and `< k`
    * originals (it is implied by the weaker bound).
    */
  private def prefilter(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  private def augment(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val additions = conjuncts.flatMap(boundOf)
      .map { case (l, r, k) => prefilter(l, r, k) }
      .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
    if (additions.isEmpty) cond
    // prefilters FIRST: And evaluates left-to-right, cheap check gates the DP
    else (additions ++ conjuncts).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = augment(cond)
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = augment(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }
}
