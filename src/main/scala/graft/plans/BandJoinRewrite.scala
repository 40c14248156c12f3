package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a band-only inner join — a join whose ONLY
  * condition brackets one left-side integral expression between two
  * right-side expressions (`p >= lo AND p <= hi`, any strictness) —
  * into the binned equi-join shape of
  * [[graft.operators.RangeJoin.pointInInterval]].
  *
  * Spark has no join strategy for pure range conditions: the planner
  * falls back to BroadcastNestedLoopJoin (or a cartesian), comparing
  * every point to every interval — the quadratic cliff users hit the
  * first time a time-window join's dimension side outgrows a broadcast.
  * This rule injects the bin key MECHANICALLY, so any band join written
  * naively — including via plain SQL, where the DataFrame-level
  * operator is out of reach — gets the linear plan:
  *
  *   left  -> Project(+ bin(p))
  *   right -> Filter(lo <= hi) -> Generate(explode(sequence(bin(lo), bin(hi))))
  *   Join(bin_l = bin_r AND <original condition>)  -> Project(original output)
  *
  * Each point carries exactly one bin, so no pair is produced twice —
  * no dedup. Null handling is value-identical to the original join:
  * a null p / lo / hi yields a null bin / empty sequence, and the row
  * matches nothing, exactly as the null comparison did.
  *
  * OPT-IN by conf — `spark.graft.bandjoin.width` (default 0 = off) —
  * because the bin width is a domain decision (pick ~ the typical
  * interval length; the optimizer has no statistic for it). Read per
  * invocation, so it can be toggled mid-session.
  *
  * The width is SESSION-GLOBAL while set: it applies to EVERY band-only
  * inner join the optimizer sees, so a width tuned for one domain can
  * explode another (a day-long millis interval at width=3600 generates
  * 24k bin rows per interval, and an extreme-but-valid span can
  * exceed sequence()'s length cap at runtime). The usage contract is
  * the conf BRACKET: set the width, run the one band join it was
  * picked for, unset it — never leave it on across unrelated queries,
  * and a query mixing band joins of different domains needs the
  * DataFrame-level [[graft.operators.RangeJoin]] operator (per-call
  * width) instead of this rule.
  *
  * Conservative matching: inner joins only, batch only, exactly the
  * two bracketing conjuncts (an extra equality conjunct already makes
  * the join an equi-join Spark plans well), integral types only. The
  * rewritten join carries an equality conjunct, so the rule cannot
  * re-fire on its own output.
  */
case class BandJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.bandjoin.width"

  // tolerant parse: this rule runs in the optimizer of EVERY query in
  // the session, so a malformed conf value ("7 ", "7x") must disable
  // the rewrite, not kill unrelated SELECTs with a bare
  // NumberFormatException
  private def width: Long =
    session.conf.get(WidthConf, "0").trim.toLongOption.getOrElse(0L)

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Floor-division bin — the SHARED primitive
    * [[graft.functions.Num.floorBinExpr]], one definition for this SQL
    * rewrite and [[graft.operators.RangeJoin]]'s DataFrame path
    * (exactness/overflow rationale lives there).
    */
  private def bin(e: Expression, w: Long): Expression =
    graft.functions.Num.floorBinExpr(e, w)

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** For `a <cmp> b` spanning the two join sides, return the
    * (leftExpr, rightExpr) pair oriented as (lower-is-left?, ...).
    */
  private def sidedPair(
      a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Boolean)] =
    if (a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
      b.references.nonEmpty && b.references.subsetOf(right.outputSet))
      Some((a, b, true))
    else if (b.references.nonEmpty && b.references.subsetOf(left.outputSet) &&
      a.references.nonEmpty && a.references.subsetOf(right.outputSet))
      Some((b, a, false))
    else None

  /** Normalize one conjunct to (p, bound, isLower): `p >= lo` is a
    * lower bound on p; `p <= hi` an upper. Strict variants identical
    * for bin coverage (the original predicate stays as the residual).
    */
  private def bound(
      c: Expression, left: LogicalPlan, right: LogicalPlan):
      Option[(Expression, Expression, Boolean)] = c match {
    // strictness is irrelevant for bin coverage (the original
    // predicate stays as the residual), so GT(E) and LT(E) collapse:
    // `p >= lo` IS a lower bound (sidedPair's flag passes through);
    // `p <= hi` flips it (`hi' <= p` is `p >= hi'`)
    case GreaterThanOrEqual(a, b) => sidedPair(a, b, left, right)
    case GreaterThan(a, b) => sidedPair(a, b, left, right)
    case LessThanOrEqual(a, b) => sidedPair(a, b, left, right)
      .map { case (p, r, isLower) => (p, r, !isLower) }
    case LessThan(a, b) => sidedPair(a, b, left, right)
      .map { case (p, r, isLower) => (p, r, !isLower) }
    case _ => None
  }

  /** Detect the band bracket in `conjuncts` with the POINT expression
    * on `pointSide` and the two bounds on `boundSide` (either
    * orientation of the join).
    */
  private def matchBand(
      conjuncts: Seq[Expression],
      pointSide: LogicalPlan, boundSide: LogicalPlan):
      Option[(Expression, Expression, Expression)] = conjuncts match {
    case Seq(c1, c2) =>
      (bound(c1, pointSide, boundSide), bound(c2, pointSide, boundSide)) match {
        case (Some((p1, lo, true)), Some((p2, hi, false)))
            if p1.semanticEquals(p2) &&
              integral(p1) && integral(lo) && integral(hi) =>
          Some((p1, lo, hi))
        case (Some((p1, hi, false)), Some((p2, lo, true)))
            if p1.semanticEquals(p2) &&
              integral(p1) && integral(lo) && integral(hi) =>
          Some((p1, lo, hi))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !j.left.isStreaming && !j.right.isStreaming =>
        val conjuncts = splitConjunctivePredicates(cond)
        matchBand(conjuncts, left, right) match {
          case Some((p, lo, hi)) => rewrite(j, p, lo, hi, w, pointIsLeft = true)
          case None =>
            // mirrored orientation: interval side on the left
            matchBand(conjuncts, right, left) match {
              case Some((p, lo, hi)) =>
                rewrite(j, p, lo, hi, w, pointIsLeft = false)
              case None => j
            }
        }
    }
  }

  private def rewrite(
      j: Join, p: Expression, lo: Expression, hi: Expression,
      w: Long, pointIsLeft: Boolean): LogicalPlan = {
    val pointChild = if (pointIsLeft) j.left else j.right
    val boundChild = if (pointIsLeft) j.right else j.left
    val pBin = Alias(bin(p, w), "__bj_bin_p")()
    val pointB = Project(pointChild.output :+ pBin, pointChild)
    val bBinAttr = AttributeReference("__bj_bin_b", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: it is unresolved until a
    // zone is attached, even over longs — attach the session zone.
    val seq = new Sequence(bin(lo, w), bin(hi, w), Literal(1L))
      .withTimeZone(conf.sessionLocalTimeZone)
    val boundB = Generate(
      Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bBinAttr),
      // an inverted interval would make sequence() run DESCENDING and
      // fabricate bins; it can match nothing, so drop it up front
      child = Filter(LessThanOrEqual(asLong(lo), asLong(hi)), boundChild))
    val (newLeft, newRight) =
      if (pointIsLeft) (pointB, boundB) else (boundB, pointB)
    val joined = Join(newLeft, newRight, Inner,
      Some(And(EqualTo(pBin.toAttribute, bBinAttr), j.condition.get)), j.hint)
    Project(j.output, joined)
  }
}
