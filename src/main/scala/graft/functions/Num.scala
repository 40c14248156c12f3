package graft.functions

import org.apache.spark.sql.Column

/** Shared numeric-input guards for operators that cast user data into
  * exact (DECIMAL) or integral (LONG cell ids) domains under ANSI.
  *
  * The recurring hole this closes (found three times in one review
  * wave): an entry filter that excludes NULL but lets a non-finite or
  * over-magnitude double through, where the downstream cast either
  * ANSI-aborts the WHOLE job (cast(NaN/Inf AS DECIMAL), cast(1e300
  * AS LONG)) or silently corrupts (floor(NaN).cast("long") is 0 — the
  * Z-order rank-collapse class). One definition, one semantic: a row
  * whose value cannot survive the operator's casts is excluded up
  * front like a NULL (no measurement), never allowed to cost the job.
  */
object Num {

  /** Largest magnitude a double may carry into a DECIMAL(38, 0) cast:
    * the type's ceiling is 10^38 − 1, so anything at or above 1e38
    * ANSI-overflows; 9e37 leaves a full decade of margin while
    * excluding nothing a real count/measurement column can hold.
    */
  val Decimal38Bound: Double = 9e37

  /** value is non-NULL, non-NaN, and within ±bound. One predicate
    * covers all three: `between` is false for NaN (every NaN
    * comparison is) and for anything past the bound — including ±Inf —
    * and never excludes a legitimate in-domain magnitude.
    */
  def finiteWithin(c: Column, bound: Double): Column =
    c.isNotNull && c.cast("double").between(-bound, bound)

  /** [[finiteWithin]] at the widest finite-double range — excludes
    * only NULL/NaN/±Inf. Use when the downstream math stays in
    * doubles; prefer a real bound when a cast narrows the domain.
    */
  def finite(c: Column): Column =
    finiteWithin(c, Double.MaxValue)

  /** WHEN a built-in round(x, 6) is cross-engine safe and when it is
    * not — the completed triage (r9 incident + r10 sweep), used by
    * RoundTriageSpec's tripwire:
    *
    * A divergence needs the TRUE value exactly on a .5e-6 boundary,
    * i.e. (2m+1)/2e6 with 2e6 = 2^7·5^6, so the value's reduced
    * denominator must be 2^7·5^j (j in 0..6).
    *  - j = 0 (denominator 2^7·odd — dyadic): the boundary IS exactly
    *    representable, both engines compute it exactly and HALF_UP
    *    identically — safe.
    *  - j >= 1 (640, 3200, 16000, …): NOT representable; the two
    *    engines tie-break different views of the nearest double and
    *    CAN disagree — the r9 sf0.1 incident class.
    * Consequences:
    *  - integer/quantized-grid SINGLE ratios k/n with n < 640 can
    *    never hit a divergent boundary — built-in round stays;
    *  - single ratios over UNBOUNDED data-dependent denominators
    *    (table totals, degree sums, document frequencies) are
    *    converted to [[portableRound6]] with the oracle in lockstep
    *    (r10: shares, retention, transition/assoc/markov, AUC/PR/
    *    kappa/brier, KS, gini/hhi/top-share/k-anon/benford, tf-idf,
    *    vocab rate, pagerank/triangles kernels);
    *  - COMPOSITE rationals (sums of many heterogeneous rational
    *    terms: chi², PSI/MI/JSD log terms, OLS covariance ratios,
    *    percentile interpolation) keep built-in round: the sum's
    *    reduced denominator is an lcm over many terms and cannot
    *    collapse to 2^7·5^j except on degenerate inputs, and the log/
    *    sqrt families are irrational (ties measure-zero);
    *  - values already ON the 1e-6 grid (re-rounds of 6dp decimals,
    *    min/max of 2dp data) make round an identity — safe.
    */

  /** Largest |x| [[portableRound6]] rounds rather than passes through:
    * keeps `x * 1e6 + 0.5` inside 2^53 (every intermediate integer
    * exact in a double on BOTH engines) and inside Spark's ANSI
    * floor→BIGINT range. Past it a double's ulp already exceeds 1e-6,
    * so 6-place rounding is a no-op anyway.
    */
  val PortableRoundBound: Double = 9e9

  /** Engine-portable 6-place rounding of a double: the SAME IEEE ops
    * (`floor(x * 1e6 + 0.5) / 1e6`) on every engine, so the result is
    * bit-identical for the same input double — the property the
    * registry's final-projection rounds actually need.
    *
    * Why not round(x, 6) on each side (the r9 sf0.1 incident — four
    * rows across q_embed_centroid/q_sample_dsir, hash-red at sf0.1
    * only): the built-in ROUNDs decide ties on DIFFERENT views of the
    * same double. Spark rounds the SHORTEST DECIMAL REPR
    * (BigDecimal.valueOf: 1.0079725 → 1.007973) while DuckDB rounds
    * the SCALED DOUBLE (floor-ish of x*1e6: 1.0079725*1e6 lands below
    * .5 → 1.007972), so any mean/ratio whose true value sits within
    * ~1 ulp of a .5e-6 boundary diverges — data-dependent, invisible
    * at small SF. This form makes both engines evaluate the identical
    * multiply/add/floor/divide chain (each correctly rounded by
    * IEEE 754, floor exact) — agreement by construction on ANY data,
    * not by each engine's tie convention. Ties resolve toward +inf
    * (floor(±x.5 + 0.5)), a documented difference from HALF_UP for
    * negative ties.
    *
    * NULL, NaN, ±Inf, and |x| > [[PortableRoundBound]] pass through
    * unchanged (`between` is false for all of them, in both engines'
    * NaN-total-order semantics) — never an ANSI abort, and both
    * engines take the same branch. Oracle side: the lockstep fragment
    * is [[portableRound6Sql]].
    */
  def portableRound6(c: Column): Column = portableRound(c, 6)

  /** [[portableRound6]] at an arbitrary scale 1..6: the identical
    * floor(x·10^p + 0.5)/10^p chain at 10^p ∈ {10, …, 1e6}. The
    * pass-through bound stays [[PortableRoundBound]] for every scale —
    * conservative below 6 places (2^53/10^p admits more at p < 6), but
    * ONE bound means one documented domain and both engines branch
    * identically at every scale. Needed the day q_window_movavg's
    * 4-place round hit the same tie class: a 2dp-grid DECIMAL sum over
    * a window COUNT lands exactly on .5e-4 boundaries (odd cents
    * summed over 8 rows), so the 6-place-only helper left the class
    * live at other scales.
    */
  def portableRound(c: Column, places: Int): Column = {
    import org.apache.spark.sql.functions.{floor, lit, when}
    val p = pow10(places)
    val x = c.cast("double")
    when(x.between(-PortableRoundBound, PortableRoundBound),
      floor(x * lit(p) + lit(0.5)).cast("double") / lit(p))
      .otherwise(x)
  }

  /** DuckDB fragment computing exactly [[portableRound6]] — `inner`
    * is referenced three times, so bind it to a cheap column (an extra
    * nested SELECT) at the call site rather than pasting an aggregate.
    */
  def portableRound6Sql(inner: String): String = portableRoundSql(inner, 6)

  /** Scale-parameterized [[portableRound6Sql]] — the oracle lockstep of
    * [[portableRound]]. The literal is rendered as `1e<p>` so both the
    * Spark literal and the SQL literal parse to the SAME double (exact
    * for p <= 15).
    */
  def portableRoundSql(inner: String, places: Int): String = {
    pow10(places) // validates the range
    s"(CASE WHEN ($inner) BETWEEN -9e9 AND 9e9" +
      s" THEN FLOOR(($inner) * 1e$places + 0.5) / 1e$places ELSE ($inner) END)"
  }

  /** 10^places as an exact double, range-checked once for both the
    * Column and SQL renderers (past 6 the helper's shared bound no
    * longer keeps x·10^p inside 2^53 — widen deliberately, not by
    * accident).
    */
  private def pow10(places: Int): Double = {
    require(places >= 1 && places <= 6,
      s"portableRound supports 1..6 places, got $places")
    math.pow(10.0, places)
  }

  /** Exact floor-division bin id `floor(v / w)` over a LONG-typed
    * expression — ONE definition for the DataFrame range join
    * ([[graft.operators.RangeJoin]]) and the SQL optimizer rewrite
    * ([[graft.plans.BandJoinRewrite]]), which previously hand-built
    * the same tree in two files with only comments keeping them
    * aligned.
    *
    * Implementation history, because each step was a field incident:
    * v1 built `(v - pmod(v, w)) div w` in LONG — ANSI
    * ARITHMETIC_OVERFLOW when v sits within `pmod(v, w)` of
    * Long.MinValue (a missing-timestamp sentinel). v2 ran the same
    * tree in DECIMAL(21, 0) — exact over the whole long domain but
    * +84% on the binned range join: three decimal ops per PROBE ROW
    * on both join sides (BENCH_r08, spread 1.09). v3 (this) is a
    * native [[FloorBin]] expression: one codegen'd
    * `Math.floorDiv(v, w)` — floored (not truncated) division, exact
    * and overflow-free for every long when w > 0 (the JDK overflow
    * case is divisor −1 only, excluded by the `require`), zero
    * allocations, whole-stage-codegen friendly.
    */
  def floorBinExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      w: Long): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.LongType
    require(w > 0, s"bin width must be positive, got $w")
    FloorBin(if (e.dataType == LongType) e else Cast(e, LongType), w)
  }

  /** Column form of [[floorBinExpr]]. */
  def floorBin(c: Column, w: Long): Column =
    org.apache.spark.sql.graft.Bridge.column(
      floorBinExpr(org.apache.spark.sql.graft.Bridge.expression(c), w))
}

/** `Math.floorDiv(child, w)` as a native codegen'd expression — the
  * bin-id hot path of [[graft.operators.RangeJoin]] and
  * [[graft.plans.BandJoinRewrite]], evaluated once per probe row on
  * BOTH sides of every binned range join.
  *
  * Why not compose built-ins: Catalyst has no floored long division —
  * `div` truncates toward zero (wrong bin for negatives), and the
  * pmod-correction tree needs either LONG (underflows near
  * Long.MinValue, ANSI-aborts the job) or DECIMAL (exact but ~84%
  * slower per BENCH_r08). `Math.floorDiv` is floored, exact for every
  * (long, positive long) pair — the JDK's only overflow case is
  * divisor −1 — and JIT-compiles to a handful of instructions.
  *
  * `w` is a plan-time constant (bin widths are operator parameters,
  * never data), so it bakes into the generated code as a literal.
  */
case class FloorBin(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    w: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, LongType}

  require(w > 0, s"bin width must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT input, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "floor_bin"

  override def nullSafeEval(v: Any): Any =
    Math.floorDiv(v.asInstanceOf[Long], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.floorDiv($c, ${w}L)")

  override protected def withNewChildInternal(newChild: Expression): FloorBin =
    copy(child = newChild)
}
