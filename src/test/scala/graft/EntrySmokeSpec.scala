package graft
class EntrySmokeSpec extends SparkSuite {
  test("driver entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
