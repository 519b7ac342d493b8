package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The HOF spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` is
  * correct but interpreted: higher-order functions run their lambda through
  * the expression evaluator per element AND allocate the zipped array. For
  * a 64-dim embedding that is ~130 boxed evaluations per pair where a tight
  * loop needs none — this expression generates that loop (doGenCode), so
  * dot products stay inside whole-stage codegen. Summation order is the
  * same left-to-right fold as the HOF (and DuckDB's list_sum), so results
  * are bit-identical and the shared DuckDB oracles keep matching.
  *
  * Element nulls are not expected (embeddings are dense); like the HOF
  * fold, a null element would poison the sum, here it reads as 0-bits via
  * getDouble — dense non-null input is part of the contract. Mismatched
  * lengths dot the common prefix.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql] — rely on covariant inference
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of the graft native functions, so plans and
  * SQL strings can call them by name. Idempotent and cheap — callers invoke
  * it on every table load rather than tracking which sessions saw it. */
object GraftFunctions {
  def ensure(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot",
      exprs => {
        require(exprs.length == 2, "vector_dot(a, b) takes exactly 2 arguments")
        VectorDot(exprs.head, exprs(1))
      },
      "built-in")
}
