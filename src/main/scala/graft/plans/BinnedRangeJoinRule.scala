package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Optimizer rule: rewrite a pure-range inner join
  * `points ⋈ intervals ON s <= p AND p < e` — which Spark can only
  * execute as a nested-loop join (no equi keys) — into the binned
  * equi-join shape of [[graft.ops.RangeJoin]]: replicate each interval
  * to the fixed-width bins it covers, equi-join on the bin id, keep
  * the exact range predicate as a residual. Every point has exactly
  * one bin, so no dedup is needed and results are identical.
  *
  * Registered through [[graft.GraftExtensions]]; OFF unless
  * `spark.graft.rangeJoin.binWidth` is set to a positive long (bin
  * width is workload-dependent — pick ≈ the median interval length;
  * SECONDS for timestamp axes). Scope is deliberately conservative:
  * INNER join, condition exactly `p >= s AND p < e` or
  * `p >= s AND p <= e` (either operand order), all three LONG or all
  * three TIMESTAMP (binned on epoch seconds), point side and bound
  * side on opposite inputs. Everything else is left untouched.
  */
case class BinnedRangeJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  // toLongOption: this rule runs on EVERY plan in the session, so an
  // unparseable conf value must disable the rule, not poison all queries
  private def widthConf: Long =
    session.conf.get("spark.graft.rangeJoin.binWidth", "0").toLongOption
      .getOrElse {
        logWarning("spark.graft.rangeJoin.binWidth is not a long; rule disabled")
        0L
      }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = widthConf
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        matchRange(cond, l, r) match {
          case Some((p, s, e, closed)) =>
            rewrite(l, r, p, s, e, closed, width, cond, hint)
          case None => matchRange(cond, r, l) match {
            case Some((p, s, e, closed)) =>
              // point side is the RIGHT input: swap, rewrite, restore order
              val swapped = rewrite(r, l, p, s, e, closed, width, cond, hint)
              Project(j.output, swapped)
            case None => j
          }
        }
    }
  }

  /** cond == (p >= s && p < e) or (p >= s && p <= e) with p from
    * `pointSide`, s/e from `boundSide` (accepts flipped comparison
    * operand order). Returns (p, s, e, upperClosed).
    */
  private def matchRange(cond: Expression, pointSide: LogicalPlan,
      boundSide: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def axisType(x: Expression) = x.dataType == LongType || x.dataType == TimestampType
    def fromPoint(x: Expression) = x.references.nonEmpty &&
      x.references.subsetOf(pointSide.outputSet) && axisType(x)
    def fromBound(x: Expression) = x.references.nonEmpty &&
      x.references.subsetOf(boundSide.outputSet) && axisType(x)
    val (geOpt, ltOpt) = cond match {
      case And(ge, lt) => (Some(ge), Some(lt))
      case _ => (None, None)
    }
    for {
      ge <- geOpt; lt <- ltOpt
      // p >= s (or s <= p)
      (p1, s) <- ge match {
        case GreaterThanOrEqual(a, b) if fromPoint(a) && fromBound(b) => Some((a, b))
        case LessThanOrEqual(a, b) if fromBound(a) && fromPoint(b) => Some((b, a))
        case _ => None
      }
      // p < e / p <= e (or e > p / e >= p)
      (p2, e, closed) <- lt match {
        case LessThan(a, b) if fromPoint(a) && fromBound(b) => Some((a, b, false))
        case GreaterThan(a, b) if fromBound(a) && fromPoint(b) => Some((b, a, false))
        case LessThanOrEqual(a, b) if fromPoint(a) && fromBound(b) => Some((a, b, true))
        case GreaterThanOrEqual(a, b) if fromBound(a) && fromPoint(b) => Some((b, a, true))
        case _ => None
      }
      if p1.semanticEquals(p2) && p1.dataType == s.dataType && s.dataType == e.dataType
    } yield (p1, s, e, closed)
  }

  /** Epoch-seconds normalization for timestamp axes (cast ts→long is
    * floor seconds, monotone — bins stay conservative), identity for
    * longs.
    */
  private def axisLong(x: Expression): Expression =
    if (x.dataType == TimestampType) Cast(x, LongType) else x

  /** floor(x / width) — same double-division floor the DataFrame-level
    * op uses, so both formulations bin identically (exact for
    * |x| < 2^52).
    */
  private def binOf(x: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(axisLong(x), DoubleType),
      Cast(Literal(width), DoubleType))), LongType)

  private def rewrite(pointSide: LogicalPlan, boundSide: LogicalPlan,
      p: Expression, s: Expression, e: Expression, upperClosed: Boolean,
      width: Long, origCond: Expression, hint: JoinHint): LogicalPlan = {
    val pBin = Alias(binOf(p, width), "__graft_bin_p")()
    val pointProj = Project(pointSide.output :+ pBin, pointSide)
    // empty intervals match nothing and would make sequence() descend
    // (closed upper: s == e is the single-point interval, keep it)
    val nonEmpty = Filter(
      if (upperClosed) GreaterThanOrEqual(e, s) else GreaterThan(e, s),
      boundSide)
    // upper bin: open-long intervals end at e-1 exactly; timestamps
    // floor to seconds, so a fractional e still needs e's own second —
    // use floor(e) either way (conservative by ≤ one bin)
    val upper =
      if (!upperClosed && e.dataType == LongType) Subtract(e, Literal(1L))
      else e
    // explicit step + session timezone: the optimizer runs after the
    // analyzer, so nothing would fill these in and the expression
    // would stay unresolved
    val seqExpr = Sequence(
      binOf(s, width), binOf(upper, width),
      Some(Literal(1L)),
      Some(session.sessionState.conf.sessionLocalTimeZone))
    val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binAttr),
      child = nonEmpty)
    val joined = Join(pointProj, gen, Inner,
      Some(And(EqualTo(pBin.toAttribute, binAttr), origCond)), hint)
    // restore the original join's output (strip helper columns)
    Project(pointSide.output ++ boundSide.output, joined)
  }
}
