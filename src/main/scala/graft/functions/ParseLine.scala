package graft.functions

import graft.ingest.LineProtocol
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `parse_line(str)`: InfluxDB line protocol → typed struct, as a scalar
  * SQL function (the §2.10 "optional nicety": lets spark.sql users explode
  * raw protocol text without the library's typed ingest path).
  *
  * Output struct: measurement STRING, tags MAP<STRING,STRING> (wire
  * order), floats MAP<STRING,DOUBLE>, strings MAP<STRING,STRING>,
  * ts_ns BIGINT (null when the line carries no timestamp). Malformed
  * lines yield NULL — filterable, never throwing, the same skip-and-
  * continue posture as the ingest path (reference logs & continues).
  *
  * Semantics are EXACTLY [[LineProtocol.parse]] (same object, same type
  * policy: numerics → floats, booleans/strings → strings); codegen calls
  * the static evaluator, so the expression stays inside whole-stage
  * codegen without Janino-compiling the parser.
  */
case class ParseLine(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"parse_line expects a string, got $other")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ParseLine.schema
  override def prettyName: String = "parse_line"

  override def nullSafeEval(input: Any): Any =
    ParseLine.evalLine(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("parsed")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |InternalRow $row = graft.functions.ParseLine.evalLine($s);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseLine =
    copy(child = newChild)
}

object ParseLine {

  val schema: StructType = StructType(Seq(
    StructField("measurement", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("floats", MapType(StringType, DoubleType, valueContainsNull = false), nullable = false),
    StructField("strings", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("ts_ns", LongType, nullable = true)))

  private def utf8Map[V](kvs: Seq[(String, V)], conv: V => Any): ArrayBasedMapData =
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        kvs.map(kv => UTF8String.fromString(kv._1)).toArray[Any]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        kvs.map(kv => conv(kv._2)).toArray[Any]))

  /** Static evaluator shared by interpreted eval and generated code.
    * Returns null for malformed lines. */
  def evalLine(line: UTF8String): InternalRow =
    LineProtocol.parse(line.toString) match {
      case Left(_) => null
      case Right(p) =>
        val floats = p.fields.collect { case (k, LineProtocol.FloatV(v)) => (k, v) }
        val strings = p.fields.collect { case (k, LineProtocol.StringV(v)) => (k, v) }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
          UTF8String.fromString(p.measurement),
          utf8Map(p.tags, (v: String) => UTF8String.fromString(v)),
          utf8Map(floats, (v: Double) => v),
          utf8Map(strings, (v: String) => UTF8String.fromString(v)),
          p.timestampNs.map(Long.box).orNull))
    }

  /** Column form. */
  def parseLine(c: Column): Column = Bridge.column(ParseLine(Bridge.expression(c)))

  /** Make `parse_line(s)` callable from spark.sql text. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "parse_line", es => ParseLine(es.head))
}
