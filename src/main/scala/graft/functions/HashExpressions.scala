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
