package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| of two SORTED string arrays via a codegen'd two-pointer
  * merge — the exact-verify kernel of the pair miners.
  *
  * Why: `size(array_intersect(a, b))` builds a hash set of boxed
  * UTF8Strings PER ROW (measured ~10 µs per pair; the q_dedup_prefix
  * verify spent ~13 s of CPU on 444k candidate pairs, r12 stage log).
  * This expression is one linear merge over the two arrays with
  * binary `UTF8String.compareTo` — the SAME comparator `array_sort`
  * orders by, so sortedness is exactly the property the caller
  * establishes with `array_sort` — at ~100 short-string compares per
  * pair, fully inside whole-stage codegen.
  *
  * Contract: both inputs sorted ascending (array_sort order), DISTINCT
  * (the miners' shingle sets are `array_distinct` outputs by
  * construction — `SortedArrayCommonCountSpec` pins the call-site
  * coupling), with no NULL elements. Under that contract a
  * single-advance merge (each equality counts once and moves both
  * pointers) computes exactly `size(array_intersect(a, b))`; the
  * first cut skipped equal RUNS to also cover non-distinct inputs,
  * but the run-skip re-fetched and re-compared every matched element
  * (~2× the fetches on high-overlap pairs, measured on the
  * q_dedup_prefix verify) for a case no caller has. A NULL element
  * yields NULL (loudly wrong input, never a silent miscount); a NULL
  * array yields NULL like every binary null-intolerant expression.
  */
case class SortedArrayCommonCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_array_common_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getUTF8String(i); val yv = y.getUTF8String(j)
      val cmp = xv.compareTo(yv)
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val utf8 = classOf[UTF8String].getName
      s"""
         |final int $nx = $x.numElements();
         |final int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny && !${ev.isNull}) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final $utf8 $xv = $x.getUTF8String($i);
         |  final $utf8 $yv = $y.getUTF8String($j);
         |  final int $cmp = $xv.compareTo($yv);
         |  if ($cmp < 0) { $i++; }
         |  else if ($cmp > 0) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayCommonCount =
    copy(left = newLeft, right = newRight)
}

object SortedArrayCommonCount {
  def apply(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.column(
      SortedArrayCommonCount(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))
}
