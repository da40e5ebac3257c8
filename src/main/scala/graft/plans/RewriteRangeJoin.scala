package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a pure point-in-range inner join
  * (`p >= lo AND p < hi`, no equi-keys) into the binned equi-join of
  * [[RangeJoin.binnedRangeJoin]] — automatically, at plan time.
  *
  * Why a RULE and not just the helper: the helper requires the caller
  * to know the rewrite exists. Declaratively-written range joins
  * (`a.join(b, a("p") >= b("lo") && a("p") < b("hi"))`, or the same
  * in SQL) have no equality predicate, so Catalyst can only plan a
  * (broadcast) nested loop — O(points × ranges) comparisons, and a
  * hard failure once the ranges side outgrows a broadcast. With this
  * rule injected (GraftExtensions) and a bin width configured, the
  * same declarative query plans a shuffled hash join on the bin id:
  * each point meets only the ranges sharing its bin.
  *
  * Semantics are exact, not approximate: binning only PRUNES pairs
  * the retained residual predicate would reject — every qualifying
  * pair shares the point's bin by construction, a range spanning k
  * bins is replicated k times by the Generate, and NULL points or
  * bounds produce NULL bins / empty sequences, which an inner
  * equi-join drops exactly as the original predicate would.
  *
  * Opt-in by configuration: the profitable bin width depends on the
  * data (near the typical range span), so the rule fires only when
  * `spark.graft.rangeJoin.binWidth` is set to a positive number —
  * there is no statically-derivable default. The rewrite is also
  * self-limiting: the rewritten join's condition carries the bin
  * equality conjunct, so the pattern (exactly two range conjuncts,
  * no equality) cannot match its own output.
  */
class RewriteRangeJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def binWidth: Option[Double] =
    session.conf.getOption(RewriteRangeJoinRule.BinWidthKey)
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
      .filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner,
            Some(And(GreaterThanOrEqual(p, lo), LessThan(p2, hi))), hint)
            if p.semanticEquals(p2) && sidesSplit(j, p, lo, hi) =>
          rewrite(j, left, right, p, lo, hi, w, hint)
      }
  }

  /** The point must come entirely from one side and both bounds from
    * the other (either orientation); all three must be deterministic
    * (a rand()-bearing predicate must evaluate once per pair, which
    * only the original join preserves).
    */
  private def sidesSplit(j: Join, p: Expression, lo: Expression,
                         hi: Expression): Boolean = {
    if (!p.deterministic || !lo.deterministic || !hi.deterministic) return false
    val l = j.left.outputSet
    val r = j.right.outputSet
    val pointLeft = p.references.subsetOf(l) &&
      lo.references.subsetOf(r) && hi.references.subsetOf(r)
    val pointRight = p.references.subsetOf(r) &&
      lo.references.subsetOf(l) && hi.references.subsetOf(l)
    (pointLeft || pointRight) && p.references.nonEmpty &&
      lo.references.nonEmpty && hi.references.nonEmpty
  }

  private def bin(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, org.apache.spark.sql.types.DoubleType),
      Literal(w))), LongType)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      p: Expression, lo: Expression, hi: Expression,
                      w: Double, hint: JoinHint): LogicalPlan = {
    val pointOnLeft = p.references.subsetOf(left.outputSet)
    val (pointSide, rangeSide) = if (pointOnLeft) (left, right) else (right, left)
    // point side: project the bin alongside the original output
    val binP = Alias(bin(p, w), "__bin_p")()
    val pointPlan = Project(pointSide.output :+ binP, pointSide)
    // range side: one row per touched bin via an exploded sequence
    val binR = AttributeReference("__bin_r", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: optimizer-constructed nodes
    // must carry the zone themselves (ResolveTimeZone already ran)
    val seq = new Sequence(bin(lo, w), bin(hi, w), Some(Literal(1L)))
      .withTimeZone(session.sessionState.conf.sessionLocalTimeZone)
    val rangePlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binR), rangeSide)
    val cond = And(EqualTo(binP.toAttribute, binR),
      And(GreaterThanOrEqual(p, lo), LessThan(p, hi)))
    val (newLeft, newRight) =
      if (pointOnLeft) (pointPlan, rangePlan) else (rangePlan, pointPlan)
    // project the helper columns back out, preserving the join's shape
    Project(j.output, Join(newLeft, newRight, Inner, Some(cond), hint))
  }
}

object RewriteRangeJoinRule {
  /** Positive number ⇒ the rule fires with that bin width; unset or
    * non-positive ⇒ the plan is left untouched.
    */
  val BinWidthKey = "spark.graft.rangeJoin.binWidth"
}
