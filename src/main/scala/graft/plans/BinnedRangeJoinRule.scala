package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

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
  * width is workload-dependent — pick ≈ the median interval length).
  * Scope is deliberately conservative: INNER join, condition exactly
  * `GreaterThanOrEqual(p, s) AND LessThan(p, e)` (either operand
  * order), all three LONG, point side and bound side on opposite
  * inputs. Everything else is left untouched.
  */
case class BinnedRangeJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def widthConf: Long =
    session.conf.get("spark.graft.rangeJoin.binWidth", "0").toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = widthConf
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        matchRange(cond, l, r) match {
          case Some((p, s, e)) => rewrite(l, r, p, s, e, width, cond, hint)
          case None => matchRange(cond, r, l) match {
            case Some((p, s, e)) =>
              // point side is the RIGHT input: swap, rewrite, restore order
              val swapped = rewrite(r, l, p, s, e, width, cond, hint)
              Project(j.output, swapped)
            case None => j
          }
        }
    }
  }

  /** cond == (p >= s && p < e) with p from `pointSide`, s/e from
    * `boundSide` (accepts flipped comparison operand order).
    */
  private def matchRange(cond: Expression, pointSide: LogicalPlan,
      boundSide: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromPoint(x: Expression) = x.references.nonEmpty &&
      x.references.subsetOf(pointSide.outputSet) && x.dataType == LongType
    def fromBound(x: Expression) = x.references.nonEmpty &&
      x.references.subsetOf(boundSide.outputSet) && x.dataType == LongType
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
      // p < e (or e > p)
      (p2, e) <- lt match {
        case LessThan(a, b) if fromPoint(a) && fromBound(b) => Some((a, b))
        case GreaterThan(a, b) if fromBound(a) && fromPoint(b) => Some((b, a))
        case _ => None
      }
      if p1.semanticEquals(p2)
    } yield (p1, s, e)
  }

  /** floor(x / width) — same double-division floor the DataFrame-level
    * op uses, so both formulations bin identically (exact for
    * |x| < 2^52).
    */
  private def binOf(x: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Cast(Literal(width), DoubleType))),
      LongType)

  private def rewrite(pointSide: LogicalPlan, boundSide: LogicalPlan,
      p: Expression, s: Expression, e: Expression, width: Long,
      origCond: Expression, hint: JoinHint): LogicalPlan = {
    val pBin = Alias(binOf(p, width), "__graft_bin_p")()
    val pointProj = Project(pointSide.output :+ pBin, pointSide)
    // empty intervals match nothing and would make sequence() descend
    val nonEmpty = Filter(GreaterThan(e, s), boundSide)
    // explicit step + session timezone: the optimizer runs after the
    // analyzer, so nothing would fill these in and the expression
    // would stay unresolved
    val seqExpr = Sequence(
      binOf(s, width), binOf(Subtract(e, Literal(1L)), width),
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
