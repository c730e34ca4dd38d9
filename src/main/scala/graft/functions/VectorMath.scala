package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * allocates an intermediate array and evaluates lambda closures per
  * element; higher-order functions also sit outside whole-stage codegen's
  * fast path. This expression compiles to a tight scalar loop inside the
  * generated code (preference order (b) of the builder brief: custom
  * `Expression` before any UDF).
  *
  * Summation order is ascending-index, exactly like the `aggregate` fold
  * AND like DuckDB's `list_reduce` left fold — so results stay
  * bit-identical to the DuckDB oracles (same IEEE ops in the same order).
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f64 expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

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
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graft_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double graft_s = 0.0;
         |for (int graft_i = 0; graft_i < graft_n; graft_i++) {
         |  graft_s += $a.getDouble(graft_i) * $b.getDouble(graft_i);
         |}
         |${ev.value} = graft_s;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

object VectorMath {
  /** Dot product of two array<double> columns (codegen'd). */
  def dotF64(a: Column, b: Column): Column =
    Bridge.column(DotF64(Bridge.expression(a), Bridge.expression(b)))

  /** Make `dot_f64(a, b)` callable from spark.sql text. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "dot_f64", es => DotF64(es(0), es(1)))
}
