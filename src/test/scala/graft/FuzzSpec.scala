package graft

import graft.tools.Fuzz
import org.scalatest.funsuite.AnyFunSuite

/** The grammar fuzzer's in-CI contract: deterministic case selection,
  * every generated InfluxQL parses, and a sample plans + executes. The
  * value-level differential gate runs in `tools/fuzz_check.sh` (DuckDB
  * side), recorded in README — this spec keeps the generator itself from
  * rotting between those runs. */
class FuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  test("case selection is deterministic and collision-free") {
    val a = Fuzz.cases(500)
    val b = Fuzz.cases(500)
    assert(a == b)
    assert(a.size == 500)
    assert(a.map(_.name).distinct.size == a.size, "case names must be unique")
    assert(Fuzz.allCases.map(_.name).distinct.size == Fuzz.allCases.size)
  }

  test("every generated InfluxQL parses into its statement AST") {
    Fuzz.allCases.foreach { c =>
      graft.query.InfluxQlParser.parse(c.influxQl) match {
        case Right(_: graft.query.Ast.Select) => ()
        case Right(other) if c.name.endsWith("_show") =>
          assert(other.getClass.getSimpleName.startsWith("Show"),
            s"${c.name}: expected a SHOW statement, got $other")
        case other => fail(s"${c.name}: $other for ${c.influxQl}")
      }
    }
  }

  test("a deterministic sample plans and executes against sf0.001") {
    val cat = graft.sources.EventsAdapter.catalog(spark, dir)
    // every 37th case: ~26 plans through the full parse→plan→execute path
    val sample = Fuzz.allCases.indices.filter(_ % 37 == 0).map(Fuzz.allCases)
    sample.foreach { c =>
      val n = Fuzz.run(spark, cat, c).count()
      assert(n >= 0, c.name) // executes without error; row count is range-dependent
    }
    // the broadest case must actually produce rows at this SF
    val full = Fuzz.allCases.find(_.name == "fuzz_mean_1h_p0_r0").get
    assert(Fuzz.run(spark, cat, full).count() > 0)
  }
}
