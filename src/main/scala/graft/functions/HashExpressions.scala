package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 61-bit md5 content hash, natively.
  *
  * Semantics twin of [[graft.Dsl.md5h61Decl]] (and of the DuckDB oracle's
  * `md5_number_lower(x) % 2^61`): the little-endian unsigned 64-bit
  * integer of md5-digest bytes 8..15, reduced mod 2^61. The declarative
  * formulation reconstructs that value from the md5 HEX STRING — eight
  * substrings + a concat + a base-16 conv + a decimal modulo per call —
  * which is the dominant per-shingle cost in the MinHash pipeline. This
  * expression reads the digest bytes directly: one MessageDigest update
  * and one floorMod.
  *
  * Correctness of the modulo on signed longs: the true value v is a
  * uint64; Java sees l = v − 2^64 when v ≥ 2^63. Since 2^64 ≡ 0
  * (mod 2^61), floorMod(l, 2^61) == v mod 2^61 — no BigInteger needed.
  *
  * Thread safety: Catalyst evaluates shared expression trees from many
  * tasks; MessageDigest is stateful, so instances live in a ThreadLocal.
  *
  * Codegen (r18): a real doGenCode emitting one static call — the old
  * CodegenFallback made every call inside a whole-stage span wrap its
  * input into an InternalRow, dispatch the interpreted eval virtually
  * and box the long result, on the hottest expression in the dedup
  * family. The static forwarder on the companion keeps the generated
  * Java a plain `Md5Hash61.hash(bytes)`; eval and codegen share the
  * same body, so the PropertySpec bit-equality law covers both paths.
  */
case class Md5Hash61(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5h61 requires binary input (cast strings first), got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5h61"

  override def nullSafeEval(v: Any): Any =
    Md5Hash61.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash61.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash61 =
    copy(child = newChild)
}

object Md5Hash61 {
  val Mod: Long = 1L << 61
  private val local = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Shared interpreted/codegen body (see class scaladoc). */
  def hash(v: Array[Byte]): Long = {
    val digest = local.get()
    digest.reset()
    val d = digest.digest(v)
    var acc = 0L
    var i = 15
    while (i >= 8) { acc = (acc << 8) | (d(i) & 0xffL); i -= 1 }
    java.lang.Math.floorMod(acc, Mod)
  }
}
