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

/** All hyperplane-LSH band buckets of a vector in ONE pass.
  *
  * Replaces `bands*bandBits` separate `aggregate(zip_with(...))` plane
  * dots (each of which re-walks the vector and allocates an intermediate
  * array) with a single scan holding `bands*bandBits` accumulators:
  * plane j = b*bandBits + k has integer coefficient
  * `x = (2654435761·(j*64+d+1)) mod 2147483647;
  *  coef = ((x²+x) mod 2147483647) mod 2001 − 1000`, and
  * `bucket[b] = Σ_k (1<<k | dot(v, plane_{b*bandBits+k}) > 0)`.
  *
  * The quadratic re-mix matters: the previous LINEAR stream
  * `(1103515245·k+12345) mod 2001` is an arithmetic progression, so
  * every plane was a phase-shift of one progression — pairwise plane
  * |cos| up to 0.83, and at 1M vectors the correlated sign-bits
  * concentrated band buckets onto a handful of values (0.35% of the
  * corpus in ONE 23-bit bucket; the candidate join's payload shuffle
  * wrote ~70 GB before dying). The squared-mod-P scramble decorrelates
  * planes (max |cos| 0.30, bucket occupancy ≈ uniform) while staying
  * expressible in BIGINT-safe DuckDB SQL (x² < 2^62).
  *
  * Bit-identity: each accumulator adds `v[d]*coef` in ascending-d order —
  * the exact IEEE sequence of the declarative fold AND of the DuckDB
  * oracle's `list_reduce`, so bucket values are engine-identical. The
  * stream is shared with `Dedup.EmbBands` / `Similarity.NumPlanes`
  * oracles.
  */
case class HyperplaneBuckets(child: Expression, bands: Int, bandBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<double>, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  private def compute(v: ArrayData): Array[Long] = {
    val dim = math.min(v.numElements(), 64)
    val nPlanes = bands * bandBits
    val acc = new Array[Double](nPlanes)
    var d = 0
    while (d < dim) {
      val x = v.getDouble(d)
      var j = 0
      while (j < nPlanes) {
        val x0 = (2654435761L * (j.toLong * 64L + d + 1L)) % 2147483647L
        val c = ((x0 * x0 + x0) % 2147483647L) % 2001L - 1000L
        acc(j) += x * c.toDouble
        j += 1
      }
      d += 1
    }
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bkt = 0L
      var k = 0
      while (k < bandBits) {
        if (acc(b * bandBits + k) > 0.0) bkt |= (1L << k)
        k += 1
      }
      buckets(b) = bkt
      b += 1
    }
    buckets
  }

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      compute(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val acc = ctx.freshName("acc")
      val buckets = ctx.freshName("buckets")
      s"""
         |int graft_dim = java.lang.Math.min($v.numElements(), 64);
         |int graft_np = ${bands * bandBits};
         |double[] $acc = new double[graft_np];
         |for (int graft_d = 0; graft_d < graft_dim; graft_d++) {
         |  double graft_x = $v.getDouble(graft_d);
         |  for (int graft_j = 0; graft_j < graft_np; graft_j++) {
         |    long graft_x0 = (2654435761L * ((long) graft_j * 64L + graft_d + 1L)) % 2147483647L;
         |    long graft_c = ((graft_x0 * graft_x0 + graft_x0) % 2147483647L) % 2001L - 1000L;
         |    $acc[graft_j] += graft_x * (double) graft_c;
         |  }
         |}
         |long[] $buckets = new long[$bands];
         |for (int graft_b = 0; graft_b < $bands; graft_b++) {
         |  long graft_bkt = 0L;
         |  for (int graft_k = 0; graft_k < $bandBits; graft_k++) {
         |    if ($acc[graft_b * $bandBits + graft_k] > 0.0) graft_bkt |= (1L << graft_k);
         |  }
         |  $buckets[graft_b] = graft_bkt;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object VectorMath {
  /** Dot product of two array<double> columns (codegen'd). */
  def dotF64(a: Column, b: Column): Column =
    Bridge.column(DotF64(Bridge.expression(a), Bridge.expression(b)))

  /** All `bands` hyperplane band buckets of an array<double> vector in one
    * codegen'd pass (see [[HyperplaneBuckets]]). */
  def hyperplaneBuckets(v: Column, bands: Int, bandBits: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(v), bands, bandBits))

  /** Make `dot_f64(a, b)` callable from spark.sql text. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "dot_f64", es => DotF64(es(0), es(1)))
}
