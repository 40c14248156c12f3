package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into the top-k aggregator. */
case class ScoredNeighbor(id: Long, score: Double)

/** Typed bounded-heap top-k `Aggregator` (SURVEY.md §2.5 A4).
  *
  * Buffer is a score-descending array truncated at k, so the PARTIAL
  * aggregate each task emits is at most k rows — the exchange after a
  * `groupBy(key).agg(topK(...))` carries k rows per key per partition
  * instead of the full scored candidate set. This is what makes exact
  * brute-force top-k viable at 100 TB: the |corpus| × |probes| scored
  * stream is reduced map-side and never shuffled.
  *
  * Ties break on ascending id, making results deterministic for oracle
  * comparison.
  */
class TopKAggregator(k: Int)
  extends Aggregator[ScoredNeighbor, Array[ScoredNeighbor], Array[ScoredNeighbor]] {
  // k=0 would dereference buf(-1) in reduce (executor-side AIOOBE),
  // k<0 a negative allocation — fail at construction with a message
  require(k >= 1, s"k must be >= 1, got $k")

  // Total order via Double.compare so NaN ranks greatest — the same
  // place Spark's ORDER BY score DESC and the DuckDB oracle put it.
  // Plain `>` is false for NaN on either side, which would silently
  // rank a NaN-scored candidate (e.g. cosine of a zero-norm vector)
  // LAST instead of first and diverge from the window form this
  // aggregator replaces.
  private def better(a: ScoredNeighbor, b: ScoredNeighbor): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Array[ScoredNeighbor] = Array.empty

  override def reduce(
      buf: Array[ScoredNeighbor], in: ScoredNeighbor): Array[ScoredNeighbor] =
    if (buf.length == k && better(buf(k - 1), in)) buf
    else insert(buf, in)

  private def insert(
      buf: Array[ScoredNeighbor], in: ScoredNeighbor): Array[ScoredNeighbor] = {
    val out = new Array[ScoredNeighbor](math.min(buf.length + 1, k))
    var i = 0; var placed = false; var src = 0
    while (i < out.length) {
      if (!placed && (src >= buf.length || better(in, buf(src)))) {
        out(i) = in; placed = true
      } else { out(i) = buf(src); src += 1 }
      i += 1
    }
    out
  }

  override def merge(
      a: Array[ScoredNeighbor], b: Array[ScoredNeighbor]): Array[ScoredNeighbor] = {
    val out = new Array[ScoredNeighbor](math.min(a.length + b.length, k))
    var i = 0; var ia = 0; var ib = 0
    while (i < out.length) {
      out(i) =
        if (ib >= b.length || (ia < a.length && better(a(ia), b(ib)))) {
          ia += 1; a(ia - 1)
        } else { ib += 1; b(ib - 1) }
      i += 1
    }
    out
  }

  override def finish(buf: Array[ScoredNeighbor]): Array[ScoredNeighbor] = buf

  override def bufferEncoder: ExpressionEncoder[Array[ScoredNeighbor]] =
    ExpressionEncoder[Array[ScoredNeighbor]]()
  override def outputEncoder: ExpressionEncoder[Array[ScoredNeighbor]] =
    ExpressionEncoder[Array[ScoredNeighbor]]()
}

object TopK {
  /** Column-API handle: `topK(k)(col("id"), col("score"))` → sorted
    * `array<struct<id,score>>`, partial-aggregated before any shuffle.
    */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), ExpressionEncoder[ScoredNeighbor]())
}
