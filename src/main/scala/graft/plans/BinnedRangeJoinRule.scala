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
  * Registered through [[graft.GraftExtensions]]. Bin width
  * (`spark.graft.rangeJoin.binWidth`, SECONDS for timestamp axes):
  * - set to a positive long → that width (pick ≈ the median interval
  *   length);
  * - UNSET → derived per join from bound-side statistics: the median
  *   interval length via `percentile_approx` over (a bounded prefix
  *   of) the bound side. The probe is ONE small aggregation job at
  *   planning time against the interval side — the side this rewrite
  *   only makes sense for when it is the small one — cached per
  *   canonicalized bound plan;
  * - set to 0 / negative / unparseable → rule disabled (the explicit
  *   off switch; unparseable warns rather than poisoning every query).
  *
  * Scope is deliberately conservative:
  * INNER join, condition exactly `p >= s AND p < e` or
  * `p >= s AND p <= e` (either operand order), all three LONG or all
  * three TIMESTAMP (binned on epoch seconds), point side and bound
  * side on opposite inputs. Everything else is left untouched.
  */
case class BinnedRangeJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  /** Some(w > 0) = fixed width; Some(0) = disabled; None = derive. */
  private def widthConf: Option[Long] =
    session.conf.getOption("spark.graft.rangeJoin.binWidth").map { v =>
      v.toLongOption match {
        case Some(w) if w > 0 => w
        case Some(_) => 0L
        case None =>
          logWarning("spark.graft.rangeJoin.binWidth is not a long; rule disabled")
          0L
      }
    }

  // re-entrance guard: the derivation probe runs through this same
  // optimizer on this thread; it must pass through untouched
  private val deriving = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }
  // derived widths keyed by canonicalized (bound plan, s, e) — the
  // SAME bound relation joined on different interval columns has
  // different median lengths, so the plan alone is not a valid key
  private val derivedCache = new java.util.concurrent.ConcurrentHashMap[
    (LogicalPlan, Expression, Expression), java.lang.Long]()

  /** Median interval length of (a ≤100k-row prefix of) the bound side,
    * ≥ 1. Returns 0 — leave the join alone — if the probe fails or the
    * side is empty; a failed probe must never fail the user's query.
    */
  private def deriveWidth(boundSide: LogicalPlan,
      s: Expression, e: Expression): Long = {
    val key = (boundSide.canonicalized, s.canonicalized, e.canonicalized)
    val cached = derivedCache.get(key)
    if (cached != null) return cached.longValue()
    deriving.set(java.lang.Boolean.TRUE)
    val w =
      try {
        val len = Alias(Subtract(axisLong(e), axisLong(s)), "__graft_len")()
        val probe = org.apache.spark.sql.graft.PlanDataset.ofRows(
          session, Limit(Literal(100000), Project(Seq(len), boundSide)))
        val r = probe.selectExpr("percentile_approx(__graft_len, 0.5, 1000)").head()
        if (r.isNullAt(0)) 0L else math.max(1L, r.getLong(0))
      } catch {
        case t: Throwable =>
          logWarning(s"bin-width derivation failed, join left untouched: $t")
          0L
      } finally deriving.set(java.lang.Boolean.FALSE)
    if (derivedCache.size > 32) derivedCache.clear()
    derivedCache.put(key, java.lang.Long.valueOf(w))
    w
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (deriving.get()) return plan
    val conf = widthConf
    if (conf.contains(0L)) return plan
    def width(boundSide: LogicalPlan, s: Expression, e: Expression): Long =
      conf.getOrElse(deriveWidth(boundSide, s, e))
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        matchRange(cond, l, r) match {
          case Some((p, s, e, closed)) =>
            val w = width(r, s, e)
            if (w <= 0) j else rewrite(l, r, p, s, e, closed, w, cond, hint)
          case None => matchRange(cond, r, l) match {
            case Some((p, s, e, closed)) =>
              // point side is the RIGHT input: swap, rewrite, restore order
              val w = width(l, s, e)
              if (w <= 0) j
              else Project(j.output, rewrite(r, l, p, s, e, closed, w, cond, hint))
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
