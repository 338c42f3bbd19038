package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive interval-containment theta-join into the
  * bin-bucketed equi-join `operators.RangeJoin` builds by hand — so a user
  * who writes the obvious `points.join(intervals, t >= s && t < e)` gets a
  * hash-joinable plan instead of the BroadcastNestedLoopJoin Spark would
  * otherwise produce (|points|·|intervals| work). This is the published
  * range-join optimization as a `Rule[LogicalPlan]`: the same rewrite
  * Databricks' runtime applies under its RANGE_JOIN hint, here gated by the
  * session conf `spark.graft.rangeJoin.binWidth` (> 0 enables; the width is
  * the caller's statement about typical interval length, which no rule can
  * infer from the plan).
  *
  * Scope (v1, deliberately narrow — a rewrite that fires wrongly is worse
  * than none): INNER joins whose condition contains a lower bound
  * `t >= s` (or `s <= t`) and a STRICT upper bound `t < e` (or `e > t`)
  * on the same long-typed point expression, with the point evaluable on
  * one side and both bounds on the other; joins that already carry an
  * equi-conjunct are left alone (Catalyst hash-joins those on the equi key
  * and evaluates the range as a post-join filter). The rewrite keeps every
  * original conjunct, so it is row-set-preserving by construction:
  * binning only ever ADDS a necessary condition (matching rows share the
  * point's bin) — RangeRewriteSpec pins parity against the un-rewritten
  * join and against operators.RangeJoin.
  *
  * Install on a live session via `RangeJoinRewrite.install(spark)`
  * (experimental.extraOptimizations) or at build time through
  * `GraftExtensions` (spark.sql.extensions).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.rangeJoin.binWidth"

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        tryRewrite(j, left, right, cond, w).getOrElse(j)
    }
  }

  /** Exact floor division in pure long arithmetic (`(t − pmod(t,w)) div w`)
    * — the Expression mirror of RangeJoin.floorDivCol, resolved by
    * construction (every operand is LongType).
    */
  private def floorDiv(t: Expression, w: Long): Expression =
    IntegralDivide(Subtract(t, Pmod(t, Literal(w))), Literal(w))

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                         cond: Expression, w: Long): Option[LogicalPlan] = {
    val cj = splitConjunctivePredicates(cond)
    val hasEqui = cj.exists {
      case EqualTo(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(b, left) && canEvaluate(a, right))
      case _ => false
    }
    if (hasEqui) None
    else rewriteOriented(j, cj, w, pointsOnLeft = true)
      .orElse(rewriteOriented(j, cj, w, pointsOnLeft = false))
  }

  private def rewriteOriented(j: Join, cj: Seq[Expression], w: Long,
                              pointsOnLeft: Boolean): Option[LogicalPlan] = {
    val (pSide, iSide) = if (pointsOnLeft) (j.left, j.right) else (j.right, j.left)
    def onP(e: Expression) = canEvaluate(e, pSide)
    def onI(e: Expression) = canEvaluate(e, iSide)
    def lower(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(t, s) if onP(t) && onI(s) => Some(t -> s)
      case LessThanOrEqual(s, t) if onP(t) && onI(s)    => Some(t -> s)
      case _ => None
    }
    def upper(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThan(t, e) if onP(t) && onI(e)    => Some(t -> e)
      case GreaterThan(e, t) if onP(t) && onI(e) => Some(t -> e)
      case _ => None
    }
    val found = (for {
      lc <- cj.iterator; (t1, s) <- lower(lc).iterator
      uc <- cj.iterator; (t2, e) <- upper(uc).iterator
      if t1.semanticEquals(t2)
    } yield (t1, s, e)).find { case (t, s, e) =>
      t.dataType == LongType && s.dataType == LongType && e.dataType == LongType
    }
    found.map { case (t, s, e) =>
      val binP = Alias(floorDiv(t, w), "__binp")()
      val pProj = Project(pSide.output :+ binP, pSide)
      // empty intervals can never match; dropping them keeps the bin
      // sequence ascending (a descending Sequence would fabricate bins)
      val iFiltered = Filter(GreaterThan(e, s), iSide)
      val seq = Sequence(floorDiv(s, w), floorDiv(Subtract(e, Literal(1L)), w),
        None, Option(conf.sessionLocalTimeZone))
      val binI = AttributeReference("__bini", LongType,
        nullable = seq.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)()
      val gen = Generate(Explode(seq), Nil, outer = false, None, Seq(binI), iFiltered)
      val cond2 = (EqualTo(binP.toAttribute, binI) +: cj).reduce(And)
      val (l2, r2) = if (pointsOnLeft) (pProj, gen) else (gen, pProj)
      Project(j.output, Join(l2, r2, Inner, Some(cond2), j.hint))
    }
  }
}
