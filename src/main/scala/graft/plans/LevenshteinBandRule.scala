package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: an edit-distance predicate implies a length-band
  * predicate — `levenshtein(a, b) <= k` can only hold when
  * `abs(length(a) - length(b)) <= k` (each edit changes the length by at
  * most one). The rule injects the implied band as an extra conjunct, so
  * the O(|a|·|b|) DP runs only on length-compatible pairs and — because
  * the band is a plain deterministic predicate on the two sides — the
  * stock optimizer can push it below the join that produced the pair,
  * pruning candidates before they are even formed. This is q108's manual
  * blocking trick, automated for ANY query in the session.
  *
  * Soundness: `lev <= k ⇒ band <= k`, so rewriting the conjunct
  * `lev <= k` to `lev <= k AND band <= k` preserves semantics at any
  * position where the conjunct itself is not negated. The rule therefore
  * only touches TOP-LEVEL conjuncts of a Filter condition (negations and
  * disjunctions are left alone), and tags injected predicates so a
  * re-run never stacks duplicates (the rule is fixed-point-safe).
  *
  * Covered shapes (both orientations):
  *   - `levenshtein(a, b) <= k`  /  `k >= levenshtein(a, b)`
  *   - `levenshtein(a, b) <  k`  /  `k >  levenshtein(a, b)`
  *   - `levenshtein(a, b, t) >= 0` (thresholded form returns -1 above t)
  *
  * Registered via [[GraftExtensions]]:
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def band(l: Expression, r: Expression, k: Int): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), Literal(k))

  /** The band implied by one positive conjunct, if it is a recognized
    * edit-distance bound. */
  private def impliedBand(conjunct: Expression): Option[Expression] = conjunct match {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
      Some(band(a, b, k))
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
      Some(band(a, b, k - 1))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) =>
      Some(band(a, b, k))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) =>
      Some(band(a, b, k - 1))
    case GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(t: Int, IntegerType))), Literal(0, IntegerType)) =>
      Some(band(a, b, t))
    case _ => None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val bands = conjuncts.flatMap(impliedBand)
        // fixed point: don't re-add a band that's already a conjunct
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (bands.isEmpty) f
      else Filter((conjuncts ++ bands).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

// Registered alongside the custom-function injection in
// [[graft.GraftExtensions]] (one extensions entry point for the library).
