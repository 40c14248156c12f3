package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[Md5Long64]] — also the ThreadLocal digest reuse
  * the built-in path lacks. Kept as a plain object (no companion class)
  * so generated Java can call the static forwarder directly.
  */
object Md5Hash {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 digest bytes, big-endian — bit-for-bit the value of
    * `conv(substr(md5(s),1,8),16,10) << 32 | conv(substr(md5(s),9,8),16,10)`
    * and of DuckDB's `('0x' || substr(md5(s),1,16))::UBIGINT`.
    */
  def long64(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var r = 0L
    var i = 0
    while (i < 8) { r = (r << 8) | (d(i) & 0xFFL); i += 1 }
    r
  }
}

/** Static kernel for [[HyperplaneSignBits]]. Plain object → static
  * forwarder callable from generated Java.
  */
object HyperplaneHash {
  /** All plane dots of `vec` in one pass — the projection analog of
    * [[signBits]]: component j is the left-fold double dot with plane
    * j (fold order identical to the HOF reference and DuckDB's
    * `list_sum(list_transform(...))`, so every component is
    * bit-identical cross-engine). A dimension mismatch or null element
    * yields the all-zero vector — the same malformed-input convention
    * as [[signBits]] (whose bits are exactly the signs of these dots).
    */
  def projections(
      vec: org.apache.spark.sql.catalyst.util.ArrayData,
      planes: Array[Array[Double]]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val dim = if (planes.isEmpty) 0 else planes(0).length
    val out = new Array[Double](planes.length)
    var ok = vec.numElements() == dim
    var d = 0
    while (ok && d < dim) {
      if (vec.isNullAt(d)) ok = false
      d += 1
    }
    if (ok) {
      var j = 0
      while (j < planes.length) {
        val w = planes(j)
        var s = 0.0
        var i = 0
        while (i < dim) {
          s += vec.getFloat(i).toDouble * w(i)
          i += 1
        }
        out(j) = s
        j += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Bit j = 1 iff the left-fold double dot of `vec` with plane j is
    * >= 0 — fold order identical to
    * `aggregate(zip_with(vec, plane, (x, y) => x.cast(double) * y), 0.0, _ + _)`,
    * so the sign (and thus every LSH bucket) matches the HOF reference
    * and the DuckDB oracle bit-for-bit. A dimension mismatch or null
    * element makes every plane's dot NULL in the HOF form, which maps
    * each bit to 0 — mirrored here by returning 0L.
    */
  def signBits(
      vec: org.apache.spark.sql.catalyst.util.ArrayData,
      planes: Array[Array[Double]]): Long = {
    val dim = if (planes.isEmpty) 0 else planes(0).length
    if (vec.numElements() != dim) return 0L
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return 0L
      d += 1
    }
    var bits = 0L
    var j = 0
    while (j < planes.length) {
      val w = planes(j)
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += vec.getFloat(i).toDouble * w(i)
        i += 1
      }
      if (s >= 0) bits |= 1L << j
      j += 1
    }
    bits
  }
}

/** All sign-LSH hyperplane bits of an `array<float>` vector, packed
  * into one long (bit j = plane j) in a single pass.
  *
  * Why custom: the composed form is nPlanes separate `aggregate(
  * zip_with(...))` HOFs per row — interpreted, allocating, and each
  * re-reading the vector. This runs on the FULL corpus scan of every
  * LSH operator (top-k and pair mining), where one tight nested loop
  * is the shape that survives 100 TB. Sign semantics are bit-for-bit
  * the HOF form's (asserted in tests), so the DuckDB oracles that
  * re-derive buckets from the same plane doubles are unchanged.
  */
case class HyperplaneSignBits(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 60,
    s"plane count ${planes.length} outside [1, 60]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sign_bits"

  override def nullSafeEval(a: Any): Any =
    HyperplaneHash.signBits(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneHash.signBits($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSignBits = copy(child = newChild)
}

/** Dense random projection of an `array<float>` vector onto `planes`
  * (outDim × dim), all components in a single pass over the vector —
  * the Johnson–Lindenstrauss dimensionality-reduction primitive.
  *
  * Why custom (same bar as [[HyperplaneSignBits]]): the composed form
  * is outDim separate `aggregate(zip_with(...))` HOFs per row —
  * interpreted, allocating, and each re-reading the vector — on what
  * is by construction a full-corpus scan. One tight nested loop with
  * the planes held as a reference object is the shape that survives
  * 100 TB. Component arithmetic is bit-for-bit the HOF form's
  * (asserted in tests), so DuckDB oracles re-derive every projected
  * value from the same md5 plane recipe.
  */
case class HyperplaneProjections(
    child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 1024,
    s"plane count ${planes.length} outside [1, 1024]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hyperplane_projections"

  override def nullSafeEval(a: Any): Any =
    HyperplaneHash.projections(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneHash.projections($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneProjections = copy(child = newChild)
}

/** Native md5-derived 64-bit hash of a string.
  *
  * Why a custom expression (measured, same bar as the vector ones): the
  * composed built-in form — `conv(substring(md5(x), 1, 8), 16, 10)`
  * twice, shifted and OR'd — allocates a 32-char hex string, two
  * substring strings, two decimal strings, and a fresh MessageDigest
  * per evaluation. On the rolling-fingerprint path that is ~490 gram
  * hashes per document; the corpus fingerprint query spent most of its
  * time in that allocation churn. This expression digests the UTF-8
  * bytes straight to a long with a ThreadLocal digest — identical bits
  * to the composed form (asserted in tests), so every DuckDB oracle is
  * unchanged.
  */
case class Md5Long64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long64"

  override def nullSafeEval(s: Any): Any =
    Md5Hash.long64(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.long64($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long64 =
    copy(child = newChild)
}
