package graft

import graft.functions.{DotF64, HyperplaneBuckets, ParseLine}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Builder-time extension point: `spark.sql.extensions=graft.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) registers the
  * library's custom Catalyst expressions in every session derived from
  * the builder — the deployment-grade alternative to the per-session
  * `VectorMath.register` helper.
  *
  * Injected surface:
  *  - `dot_f64(array<double>, array<double>)` — codegen'd sequential dot
  *    product (the deterministic summation kernel behind the ANN/dedup
  *    cosine operators);
  *  - `hyperplane_buckets(array<double>, bands, bandBits)` — all LSH band
  *    buckets of a vector in one codegen'd pass;
  *  - `parse_line(string)` — InfluxDB line protocol → typed struct
  *    (null on malformed input).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (es: Seq[Expression]) => DotF64(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (es: Seq[Expression]) => HyperplaneBuckets(es.head,
        bands = es(1).eval().asInstanceOf[Number].intValue(),
        bandBits = es(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("parse_line"),
      new ExpressionInfo(classOf[ParseLine].getName, "parse_line"),
      (es: Seq[Expression]) => ParseLine(es.head)))
  }
}
