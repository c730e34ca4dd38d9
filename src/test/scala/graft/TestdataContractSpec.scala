package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Loud early-warning contract on the driver-generated testdata (round-3
  * postmortem: a silent `events.ts` re-encoding broke 111 entries with no
  * direct signal). Every schema/shape assumption the oracle entries bake
  * in is asserted here against the smallest SF, so a testdata
  * regeneration that drifts fails THIS spec with a readable message
  * instead of surfacing as a hundred opaque entry crashes.
  */
class TestdataContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  private def fieldTypes(table: String): Map[String, DataType] =
    spark.read.parquet(s"$dir/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: columns the adapter and entries rely on") {
    val t = fieldTypes("events")
    assert(t.contains("event_id") && t("event_id") === LongType, t)
    assert(t.contains("user_id") && t("user_id") === LongType, t)
    assert(t.contains("event_type") && t("event_type") === StringType, t)
    assert(t.contains("value") && t("value") === DoubleType, t)
    assert(t.contains("props") && t("props") === StringType, t)
    // any of the three encodings EventsAdapter dispatches on
    assert(Seq(LongType, TimestampType, TimestampNTZType).contains(t("ts")),
      s"events.ts encoding drifted to ${t("ts")} — extend EventsAdapter.events")
    // the tag-pinned entries (user filters) assume user 7 exists with
    // both click and view activity at every SF
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    import org.apache.spark.sql.functions.col
    val byType = ev.filter(col("user_id") === 7)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("click", 0L) > 0, s"user 7 lost click rows: $byType")
    assert(byType.getOrElse("view", 0L) > 0, s"user 7 lost view rows: $byType")
    // every ts entry pins the [FromNs, ToNs) = [2024-01-01, 2025-01-01)
    // query window — the generated data must still live inside it
    val mm = ev.agg(
      org.apache.spark.sql.functions.min("ts_ns"),
      org.apache.spark.sql.functions.max("ts_ns")).collect()(0)
    assert(mm.getLong(0) >= SparkEntry.FromNs && mm.getLong(1) <= SparkEntry.ToNs,
      s"events time range [${mm.getLong(0)}, ${mm.getLong(1)}] drifted outside " +
        s"the SparkEntry [FromNs, ToNs] query window — every ts entry would go empty")
  }

  test("documents: curation-pipeline columns") {
    val t = fieldTypes("documents")
    assert(t("doc_id") === LongType, t)
    assert(t("text") === StringType, t)
    assert(t("lang") === StringType, t)
    assert(t("source") === StringType, t)
    assert(t("n_chars") === LongType, t)
  }

  test("embeddings: 64-dim float vectors with int labels") {
    val t = fieldTypes("embeddings")
    assert(t("vec_id") === LongType, t)
    assert(t("label") === IntegerType, t)
    assert(t("embedding") === ArrayType(FloatType, containsNull = true) ||
      t("embedding") === ArrayType(FloatType, containsNull = false), t)
    // every oracle SQL hardcodes range(1, 65): dim MUST be 64
    import org.apache.spark.sql.functions.{size, col, min => smin, max => smax}
    val dims = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(size(col("embedding")).as("d"))
      .agg(smin("d"), smax("d")).collect()(0)
    assert(dims.getInt(0) === 64 && dims.getInt(1) === 64,
      s"embedding dim drifted to [${dims.getInt(0)}, ${dims.getInt(1)}] — Dim=64 is baked into the oracle SQL")
  }

  test("TPC-H tables: the key/measure columns the olap entries touch") {
    val li = fieldTypes("lineitem")
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey")) assert(li(c) === LongType, li)
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")) assert(li(c) === DoubleType, li)
    for (c <- Seq("l_returnflag", "l_linestatus")) assert(li(c) === StringType, li)
    val ts = Set[DataType](TimestampType, TimestampNTZType)
    assert(ts.contains(li("l_shipdate")), li)
    val o = fieldTypes("orders")
    assert(o("o_orderkey") === LongType && o("o_custkey") === LongType, o)
    assert(ts.contains(o("o_orderdate")) && o("o_orderpriority") === StringType, o)
    assert(o("o_orderstatus") === StringType && o("o_totalprice") === DoubleType, o)
    val c = fieldTypes("customer")
    assert(c("c_custkey") === LongType && c("c_nationkey") === IntegerType, c)
    assert(c("c_mktsegment") === StringType && c("c_acctbal") === DoubleType, c)
    val s = fieldTypes("supplier")
    assert(s("s_suppkey") === LongType && s("s_nationkey") === IntegerType, s)
    val p = fieldTypes("part")
    assert(p("p_partkey") === LongType && p("p_brand") === StringType
      && p("p_type") === StringType && p("p_size") === IntegerType
      && p("p_retailprice") === DoubleType, p)
    val n = fieldTypes("nation")
    assert(n("n_nationkey") === IntegerType && n("n_regionkey") === IntegerType
      && n("n_name") === StringType, n)
    val r = fieldTypes("region")
    assert(r("r_regionkey") === IntegerType && r("r_name") === StringType, r)
  }
}
