package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants on the query/oracle registries (the t2 gate
  * silently skips an oracle whose query name doesn't match — guard the
  * wiring, not just the queries). */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every declared query has an oracle (no rows-only checks remain)") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  test("flagship entry returns rows (the driver's smoke check)") {
    // entry() hardcodes sf0.001, per the driver contract.
    val spark = SparkSuite.session
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL is DuckDB-shaped: non-empty, no Spark-only functions") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      // Spark-isms that DuckDB would reject — catch drift early.
      for (bad <- Seq("get_json_object", "posexplode", "xxhash64", "unix_millis"))
        assert(!sql.contains(bad), s"$name oracle uses Spark-only '$bad'")
    }
  }
}
