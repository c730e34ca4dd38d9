package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Deterministic hash-stratified sampling for detector-evaluation entries.
  *
  * The brute/exact "truth" relations that recall/precision evals compare
  * against are the only O(n²) stages anywhere in the engine — fine as
  * small-SF oracle anchors, unrunnable over a 100 TB corpus. The honest
  * scale form estimates the same ratios on a deterministic id-hash sample:
  * exact truth ON the sample, documented estimator, cost bounded by
  * (pct·n)² with pct shrinking as the corpus grows.
  *
  * The predicate is a multiplicative hash (LCG constants shared with the
  * engine's hyperplane streams) reduced mod 100 — NOT `id % k`, so
  * stratification is independent of any id-assignment pattern. The same
  * closed form is inlined into the DuckDB oracle SQL, keeping the gate
  * bit-exact: both engines evaluate pure int64 arithmetic (max id ~1e12
  * keeps `id * 1103515245` far from overflow).
  */
object EvalSampling {

  /** Sample percentage for the eval entries. 50 keeps every SF's planted
    * near-dup truth non-empty (verified sf0.001/0.01/0.1) while halving
    * each side of the quadratic truth joins; a 100 TB run would dial this
    * to ~1 (pair cost 1e-4 of full). */
  val Pct = 50

  /** The predicate as SQL text — identical in Spark and DuckDB. */
  def sqlPred(id: String): String =
    s"((($id * 1103515245 + 12345) % 2147483647) % 100) < $Pct"

  /** Sampled view of a table, by its id column. */
  def apply(df: DataFrame, idCol: String): DataFrame = df.filter(expr(sqlPred(idCol)))

  /** Rewrite every `FROM table` / `JOIN table` reference in an oracle to
    * the sampled subset (DuckDB allows unaliased FROM-subqueries, and a
    * trailing alias binds to the subquery, so both shapes survive). */
  def sampleOracle(oracle: String, table: String, id: String): String = {
    val sub = s"(SELECT * FROM $table WHERE ${sqlPred(id)})"
    oracle.replace(s"FROM $table", s"FROM $sub").replace(s"JOIN $table", s"JOIN $sub")
  }
}
