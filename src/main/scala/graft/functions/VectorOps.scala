package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no UDFs,
  * so the expressions stay inside whole-stage codegen and never serialize
  * row-by-row through a closure.
  *
  * All accumulation is left-to-right in Double, which makes results
  * bit-deterministic for a given array order (needed for oracle parity).
  */
object VectorOps {

  private def d(c: Column): Column = c.cast("double")

  private def expr(c: Column) = org.apache.spark.sql.graft.Bridge.expression(c)
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.Bridge.column(e)

  /** Native codegen'd dot product (see FloatVecDot — >100× the HOF
    * form on the pairwise-similarity hot path, same bits).
    */
  def dot(a: Column, b: Column): Column = col(FloatVecDot(expr(a), expr(b)))

  /** HOF reference implementation, kept for cross-checking the native
    * expression in tests.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = col(FloatVecNormSq(expr(a)))

  def normSqHof(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x) * d(x))

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def euclideanDistSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)
}
