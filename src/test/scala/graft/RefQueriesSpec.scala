package graft

import graft.queries.RefQueries

/** Smoke: every registered reference-parity query runs on sf0.001 and
  * returns rows; the oracle map stays in sync with the query map.
  */
class RefQueriesSpec extends SparkSpec {

  test("registry: every query has a name-synced oracle") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  for (q <- RefQueries.queries)
    test(s"${q.name} runs on sf0.001 with rows > 0") {
      assert(q.fn(spark, sf0001).count() > 0)
    }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
