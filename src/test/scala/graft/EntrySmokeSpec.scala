package graft
class EntrySmokeSpec extends SparkSuite {
  test("driver entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q45 bucketed aggregation runs shuffle-free on sf0.001") {
    val row = SparkEntry.queries("q45_bucket_agg")(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Boolean]("bucket_held"),
      "bucket(8, o_custkey) scan must stamp every file and plan exchange-free")
    assert(row.getAs[Long]("n_rows") > 0)
  }
}
