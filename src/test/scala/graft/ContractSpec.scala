package graft

/** Driver-contract invariants: every query runs non-empty on the smoke
  * SF, every oracle key has a query, and the flagship entry returns rows.
  */
class ContractSpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query returns rows on sf0.001") {
    val empty = SparkEntry.queries.keys.filter(rows(_) == 0)
    assert(empty.isEmpty, s"empty results: ${empty.toList.sorted}")
  }
}
