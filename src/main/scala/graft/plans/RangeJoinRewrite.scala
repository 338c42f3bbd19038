package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampType}

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
  * Scope (v2): joins whose condition contains a lower bound `t >= s` (or
  * `s <= t`) and a STRICT upper bound `t < e` (or `e > t`) on the same
  * point expression, with the point evaluable on one side and both bounds
  * on the other. Point types: LONG (binWidth in the value's own unit), INT
  * (widened exactly to long), and TIMESTAMP (normalized to exact epoch
  * MICROseconds — binWidth is then in µs). Type matching is
  * cast-insensitive in the sense that matters post-analysis: binary
  * comparisons already carry the analyzer's widening casts, so the rule
  * keys on the comparison's common operand type, never on the raw column's.
  * Join types: INNER both orientations; LEFT OUTER when the point side is
  * the left input and RIGHT OUTER when it is the right — the preserved
  * (null-extended) side must be the un-exploded point side, since a
  * non-matching INTERVAL on the preserved side would null-extend once per
  * bin copy. Joins that already carry an equi-conjunct are left alone
  * (Catalyst hash-joins those on the equi key and evaluates the range as a
  * post-join filter).
  *
  * The rewrite keeps every original conjunct, so it is row-set-preserving
  * by construction: binning only ever ADDS a necessary condition (matching
  * rows share the point's bin) — and under the outer joins the preserved
  * side appears exactly once whether matched or null-extended.
  * RangeRewriteSpec pins parity against the un-rewritten join and against
  * operators.RangeJoin for every type and join shape.
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
        tryRewrite(j, left, right, cond, w, Inner).getOrElse(j)
      case j @ Join(left, right, LeftOuter, Some(cond), _) =>
        tryRewrite(j, left, right, cond, w, LeftOuter).getOrElse(j)
      case j @ Join(left, right, RightOuter, Some(cond), _) =>
        tryRewrite(j, left, right, cond, w, RightOuter).getOrElse(j)
    }
  }

  /** Exact floor division in pure long arithmetic (`(t − pmod(t,w)) div w`)
    * — the Expression mirror of RangeJoin.floorDivCol, resolved by
    * construction (every operand is LongType).
    */
  private def floorDiv(t: Expression, w: Long): Expression =
    IntegralDivide(Subtract(t, Pmod(t, Literal(w))), Literal(w))

  /** Exact monotonic LongType normalization of a supported point-type
    * expression: identity for long, a lossless widening cast for int, and
    * exact epoch micros for timestamp (a plain long cast would floor to
    * SECONDS — lossy enough to merge distinct bound values, which binning
    * must never do). Returns None for unsupported types.
    */
  private def toLong(e: Expression): Option[Expression] = e.dataType match {
    case LongType      => Some(e)
    case IntegerType   => Some(Cast(e, LongType))
    case TimestampType => Some(UnixMicros(e))
    case _             => None
  }

  private def supported(t: DataType): Boolean =
    t == LongType || t == IntegerType || t == TimestampType

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                         cond: Expression, w: Long,
                         joinType: JoinType): Option[LogicalPlan] = {
    val cj = splitConjunctivePredicates(cond)
    val hasEqui = cj.exists {
      case EqualTo(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(b, left) && canEvaluate(a, right))
      case _ => false
    }
    if (hasEqui) None
    else joinType match {
      // the preserved side must be the un-exploded point side
      case LeftOuter  => rewriteOriented(j, cj, w, pointsOnLeft = true, LeftOuter)
      case RightOuter => rewriteOriented(j, cj, w, pointsOnLeft = false, RightOuter)
      case _ =>
        rewriteOriented(j, cj, w, pointsOnLeft = true, Inner)
          .orElse(rewriteOriented(j, cj, w, pointsOnLeft = false, Inner))
    }
  }

  private def rewriteOriented(j: Join, cj: Seq[Expression], w: Long,
                              pointsOnLeft: Boolean,
                              joinType: JoinType): Option[LogicalPlan] = {
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
      // binary comparisons guarantee s/e share t's type post-analysis; the
      // triple check guards hand-built un-analyzed conditions anyway
      supported(t.dataType) && s.dataType == t.dataType && e.dataType == t.dataType
    }
    found.map { case (t, s, e) =>
      val (tL, sL, eL) = (toLong(t).get, toLong(s).get, toLong(e).get)
      val binP = Alias(floorDiv(tL, w), "__binp")()
      val pProj = Project(pSide.output :+ binP, pSide)
      // empty intervals can never match; dropping them keeps the bin
      // sequence ascending (a descending Sequence would fabricate bins) —
      // and under the outer joins they sit on the exploded (non-preserved)
      // side, so dropping them never loses a preserved row
      val iFiltered = Filter(GreaterThan(e, s), iSide)
      val seq = Sequence(floorDiv(sL, w), floorDiv(Subtract(eL, Literal(1L)), w),
        None, Option(conf.sessionLocalTimeZone))
      val binI = AttributeReference("__bini", LongType,
        nullable = seq.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)()
      val gen = Generate(Explode(seq), Nil, outer = false, None, Seq(binI), iFiltered)
      val cond2 = (EqualTo(binP.toAttribute, binI) +: cj).reduce(And)
      val (l2, r2) = if (pointsOnLeft) (pProj, gen) else (gen, pProj)
      Project(j.output, Join(l2, r2, joinType, Some(cond2), j.hint))
    }
  }
}
