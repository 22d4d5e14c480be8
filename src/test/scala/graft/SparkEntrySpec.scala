package graft

/** Driver-contract invariants: the flagship smoke, key hygiene between
  * queries and oracles, and that every query at least plans. */
class SparkEntrySpec extends SparkSpec {

  test("entry() produces rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("oracle SQL strings are single-line and non-empty (driver JSON contract)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.nonEmpty, k)
      assert(!sql.contains("\n"), s"$k has a newline")
    }
  }

  test("every query plans against sf0.001 (analysis-time validity)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, name)
    }
  }
}
