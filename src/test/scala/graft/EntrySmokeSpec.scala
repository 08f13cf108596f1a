package graft
class EntrySmokeSpec extends SparkTestBase {
  test("driver entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.size === 148)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
