package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over a token array, in one pass.
  *
  * The declarative route — `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", element_at(t, i), ...)))` — runs on Catalyst's
  * interpreted higher-order-function path: 3 interpreted element_at calls
  * plus a concat per shingle per row (~1.4 ms/doc, the dominant cost of
  * the whole MinHash pipeline). This expression builds the distinct
  * shingle set in a single pass over the array (~µs/doc), preserving
  * first-occurrence order.
  *
  * Semantics twin (DuckDB oracle):
  *   list_distinct(list_transform(generate_series(1, len(t)-2),
  *     i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
  * Shingle SETS are order-insensitive downstream (min-hash, intersect
  * sizes), so list_distinct's arbitrary output order does not matter.
  */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"distinct_shingles requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"

  override def nullSafeEval(v: Any): Any =
    DistinctShingles.shingles(v.asInstanceOf[ArrayData], n)

  // r18: real codegen instead of CodegenFallback — inside a whole-stage
  // span the fallback wrapped every input into an InternalRow and
  // dispatched the interpreted eval; the generated code now makes one
  // static call (eval and codegen share the same body, so the
  // PropertySpec laws cover both paths)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DistinctShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

object DistinctShingles {
  private val sep = UTF8String.fromString(" ")

  /** Shared interpreted/codegen body (see class scaladoc). */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val parts = new Array[UTF8String](n)
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  /** Register graft text expressions on the session's FunctionRegistry
    * (idempotent). Usage: expr("distinct_shingles(tokens, 3)"). */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "distinct_shingles",
      { exprs =>
        require(exprs.length == 2, "distinct_shingles(tokens, n)")
        val n = exprs(1).eval(InternalRow.empty).asInstanceOf[Int]
        DistinctShingles(exprs.head, n)
      },
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5h61",
      { exprs =>
        require(exprs.length == 1, "md5h61(bytes)")
        Md5Hash61(exprs.head)
      },
      "built-in")
  }
}
