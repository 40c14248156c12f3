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

  /** Exact floor-division bin id `floor(v / w)` over a LONG-typed
    * expression — ONE definition for the DataFrame range join
    * ([[graft.operators.RangeJoin]]) and the SQL optimizer rewrite
    * ([[graft.plans.BandJoinRewrite]]), which previously hand-built
    * the same tree in two files with only comments keeping them
    * aligned.
    *
    * Semantics and why each piece: `pmod` keeps FLOOR behavior on
    * negative values (plain `div` truncates toward zero);
    * `IntegralDivide` (`div`) is exact where `Column./` coerces longs
    * to double and silently mis-bins past 2^53; and the subtraction
    * runs in DECIMAL(21, 0) because `v - pmod(v, w)` in LONG
    * underflows for v within `pmod(v, w)` of Long.MinValue — an ANSI
    * ARITHMETIC_OVERFLOW that killed the whole join when a
    * missing-timestamp sentinel used Long.MinValue (decimal at 21
    * digits holds every long exactly, and `div` on decimals still
    * returns an exact LONG).
    */
  def floorBinExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      w: Long): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, IntegralDivide, Literal, Pmod, Subtract}
    import org.apache.spark.sql.types.{Decimal, DecimalType, LongType}
    require(w > 0, s"bin width must be positive, got $w")
    val dec = DecimalType(21, 0)
    val el = Cast(
      if (e.dataType == LongType) e else Cast(e, LongType), dec)
    val wl = Literal(Decimal(w), dec)
    IntegralDivide(Subtract(el, Pmod(el, wl)), wl)
  }

  /** Column form of [[floorBinExpr]]. */
  def floorBin(c: Column, w: Long): Column =
    org.apache.spark.sql.graft.Bridge.column(
      floorBinExpr(org.apache.spark.sql.graft.Bridge.expression(c), w))
}
