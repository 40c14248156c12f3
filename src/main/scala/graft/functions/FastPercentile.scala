package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive-specialized open-addressing value→count map — the
  * aggregation buffer of [[FastPercentile]]. Keys are stored as raw
  * 64-bit longs (the input long, or `Double.doubleToLongBits` of the
  * input double — which canonicalizes NaN exactly like
  * `java.lang.Double.equals` does in the builtin's boxed map, and
  * keeps -0.0 and 0.0 distinct exactly like it too). An empty slot is
  * `counts(i) == 0` (a present key always has count >= 1), so key 0
  * needs no sentinel.
  */
private[graft] final class PctlMap(initialCapacity: Int = 1 << 10) {
  private var mask = initialCapacity - 1
  private var keys = new Array[Long](initialCapacity)
  private var counts = new Array[Long](initialCapacity)
  private var used = 0

  // 64-bit murmur3 finalizer — full avalanche so consecutive double
  // bit patterns spread across the table
  private def mix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  def add(key: Long, count: Long): Unit = {
    var i = (mix(key) & mask).toInt
    while (counts(i) != 0 && keys(i) != key) i = (i + 1) & mask
    if (counts(i) == 0) {
      keys(i) = key
      counts(i) = count
      used += 1
      if (used * 2 > mask) grow()
    } else counts(i) += count
  }

  private def grow(): Unit = {
    val ok = keys; val oc = counts
    val newCap = (mask + 1) << 1
    mask = newCap - 1
    keys = new Array[Long](newCap)
    counts = new Array[Long](newCap)
    used = 0
    var i = 0
    while (i < ok.length) {
      if (oc(i) != 0) add(ok(i), oc(i))
      i += 1
    }
  }

  def size: Int = used

  /** (keys, counts) of the occupied slots, in table order. */
  def entries: (Array[Long], Array[Long]) = {
    val ks = new Array[Long](used)
    val cs = new Array[Long](used)
    var i = 0; var j = 0
    while (i < keys.length) {
      if (counts(i) != 0) { ks(j) = keys(i); cs(j) = counts(i); j += 1 }
      i += 1
    }
    (ks, cs)
  }
}

/** Drop-in exact-percentile aggregate, bit-identical to Spark's
  * `percentile(col, p)` for DOUBLE and LONG inputs (frequency 1, the
  * only shape this repo uses) but ~1-2 orders of magnitude faster per
  * row: the builtin is a TypedImperativeAggregate over
  * `OpenHashMap[AnyRef, Long]` — every row boxes its value, hashes a
  * generic object, and allocates a closure (measured ~250k rows/s;
  * `tools/MadProbe`, r11) — while this buffer is two primitive long
  * arrays with open addressing.
  *
  * Bit-identical by construction, each piece mirroring the builtin
  * (decompiled from spark-catalyst 4.1.2, `PercentileBase`):
  *  - map keys: raw long, or `doubleToLongBits` (canonical-NaN, signed
  *    zeros distinct) — the builtin's boxed `Double.equals` key rules;
  *  - sort: `java.lang.Double.compare` total order (via the sortable
  *    bit-flip transform) for doubles, natural order for longs — the
  *    builtin's PhysicalDataType orderings;
  *  - position = percentage * (count - 1); lower/higher = floor/ceil;
  *    bracketing keys via binary search over the accumulated counts
  *    (`Arrays.binarySearch`, insertion point on miss);
  *  - interpolation in the builtin's exact double order:
  *    ((double) higher - position) * lowerVal +
  *    (position - (double) lower) * higherVal;
  *  - empty input → null; array-typed percentage literal → array
  *    output, scalar literal → scalar output.
  * `FastPercentileSpec` pins bit-equality against the builtin on
  * randomized inputs (duplicates, negatives, signed zeros, NaN,
  * single-row, grouped) and on every swapped call-site shape.
  *
  * ONE documented divergence, strictly narrower than the builtin's own
  * nondeterminism: when the input contains BOTH -0.0 and 0.0, the
  * builtin's sort treats them as a TIE (`SQLOrderingUtil
  * .compareDoubles` returns 0 on `-0.0 == 0.0`) whose order is the
  * OpenHashMap iteration layout — arbitrary, capacity-history-
  * dependent; this aggregate orders -0.0 < 0.0 (`java.lang.Double
  * .compare`), deterministically. A percentile landing exactly on the
  * tie can differ in the zero's SIGN BIT only — never numerically.
  * Every swapped call site provably cannot feed a -0.0 (prices > 0,
  * `abs()` deviations, non-negative epoch-gap doubles, `unix_micros`
  * differences), and the live-oracle sweep re-verifies each site.
  *
  * Like the builtin, the buffer holds one entry per DISTINCT value, so
  * memory scales with cardinality, not row count — the documented
  * 100 TB path stays `approx_percentile` (sketch-merged); this is the
  * exact-percentile tier both engines replay bit-for-bit.
  */
case class FastPercentile(
    child: Expression,
    percentageExpression: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PctlMap] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = percentageExpression

  private lazy val isLongInput = child.dataType == LongType

  // Mirrors PercentileBase: a foldable percentage literal, scalar or
  // array; array in => array out.
  private lazy val returnPercentileArray =
    percentageExpression.dataType.isInstanceOf[ArrayType]

  @transient private lazy val percentages: Array[Double] =
    percentageExpression.eval() match {
      case null => null
      case num: Double => Array(num)
      case arrayData: ArrayData => arrayData.toDoubleArray()
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    val inputOk = child.dataType match {
      case DoubleType | LongType => true
      case _ => false
    }
    val pctTypeOk = percentageExpression.dataType match {
      case DoubleType => true
      case ArrayType(DoubleType, false) => true
      case _ => false
    }
    if (!inputOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE or BIGINT input column, got " +
          child.dataType.sql)
    else if (!percentageExpression.foldable || !pctTypeOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable double or array<double> " +
          "percentage literal")
    else if (percentages == null ||
      percentages.exists(p => p < 0.0 || p > 1.0 || p.isNaN))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName percentages must all be in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType =
    if (returnPercentileArray) ArrayType(DoubleType, containsNull = false)
    else DoubleType

  override def nullable: Boolean = true
  override def prettyName: String = "fast_percentile"

  override def createAggregationBuffer(): PctlMap = new PctlMap()

  override def update(buffer: PctlMap, input: InternalRow): PctlMap = {
    val v = child.eval(input)
    if (v != null) {
      val key =
        if (isLongInput) v.asInstanceOf[Long]
        else java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      buffer.add(key, 1L)
    }
    buffer
  }

  override def merge(buffer: PctlMap, other: PctlMap): PctlMap = {
    val (ks, cs) = other.entries
    var i = 0
    while (i < ks.length) { buffer.add(ks(i), cs(i)); i += 1 }
    buffer
  }

  /** Monotonic bits→sortable-long transform: SIGNED long order of the
    * transformed keys IS `java.lang.Double.compare` order on the
    * doubles (-0.0 < 0.0, canonical NaN above +Infinity). Positive
    * bits map to themselves; negative bits flip all magnitude bits
    * (sign preserved), reversing the negatives' order. An involution,
    * so it is its own inverse.
    */
  private def sortable(bits: Long): Long =
    if (bits >= 0L) bits else bits ^ 0x7fffffffffffffffL

  private def keyToDouble(key: Long): Double =
    if (isLongInput) key.toDouble
    else java.lang.Double.longBitsToDouble(key)

  override def eval(buffer: PctlMap): Any = {
    if (buffer.size == 0) return null
    val (ks, cs) = buffer.entries
    val n = ks.length
    // sort keys (and counts alongside) in the builtin's value order
    val skeys = new Array[Long](n)
    var i = 0
    while (i < n) {
      skeys(i) = if (isLongInput) ks(i) else sortable(ks(i)); i += 1
    }
    dualSort(skeys, cs, 0, n - 1)
    // accumulated counts (strictly increasing — every count >= 1)
    val acc = new Array[Long](n)
    var run = 0L
    i = 0
    while (i < n) { run += cs(i); acc(i) = run; i += 1 }
    val maxPosition = run - 1L

    def valueAt(idx: Int): Double = {
      val key = if (isLongInput) skeys(idx) else sortable(skeys(idx))
      keyToDouble(key)
    }
    // Arrays.binarySearch semantics, exactly like the builtin's
    // binarySearchCount: found index, or the insertion point on miss.
    def rankIndex(target: Long): Int = {
      val r = java.util.Arrays.binarySearch(acc, 0, n, target)
      if (r < 0) -(r + 1) else r
    }

    val out = new Array[Double](percentages.length)
    i = 0
    while (i < percentages.length) {
      val position = percentages(i) * maxPosition.toDouble
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerIndex = rankIndex(lower + 1L)
      val lowerVal = valueAt(lowerIndex)
      out(i) =
        if (higher == lower) lowerVal
        else {
          val higherIndex = rankIndex(higher + 1L)
          val higherVal = valueAt(higherIndex)
          // builtin compares the BOXED keys here; key equality is bit
          // equality under our keying, and equal indices imply it
          if (higherIndex == lowerIndex) lowerVal
          else (higher.toDouble - position) * lowerVal +
            (position - lower.toDouble) * higherVal
        }
      i += 1
    }
    if (returnPercentileArray) new GenericArrayData(out) else out(0)
  }

  /** In-place quicksort of `k` with `c` carried alongside. */
  private def dualSort(k: Array[Long], c: Array[Long], lo: Int, hi: Int): Unit = {
    if (lo >= hi) return
    var i = lo; var j = hi
    val pivot = k(lo + (hi - lo) / 2)
    while (i <= j) {
      while (k(i) < pivot) i += 1
      while (k(j) > pivot) j -= 1
      if (i <= j) {
        val tk = k(i); k(i) = k(j); k(j) = tk
        val tc = c(i); c(i) = c(j); c(j) = tc
        i += 1; j -= 1
      }
    }
    dualSort(k, c, lo, j)
    dualSort(k, c, i, hi)
  }

  override def serialize(buffer: PctlMap): Array[Byte] = {
    val (ks, cs) = buffer.entries
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * ks.length)
    bb.putInt(ks.length)
    var i = 0
    while (i < ks.length) { bb.putLong(ks(i)); bb.putLong(cs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PctlMap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    // next power of two above 2n keeps the load factor < 0.5 on arrival
    val cap = math.max(1 << 10,
      java.lang.Integer.highestOneBit(math.max(1, n * 2 - 1)) << 1)
    val m = new PctlMap(cap)
    var i = 0
    while (i < n) { m.add(bb.getLong(), bb.getLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FastPercentile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FastPercentile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FastPercentile =
    copy(child = newLeft, percentageExpression = newRight)
}

object FastPercentile {

  /** Column-level entry point — use exactly like
    * `functions.percentile(c, p)` with a literal scalar/array `p`.
    */
  def pctl(c: Column, percentages: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      FastPercentile(
        org.apache.spark.sql.graft.Bridge.expression(c),
        org.apache.spark.sql.graft.Bridge.expression(percentages))
        .toAggregateExpression())
}
