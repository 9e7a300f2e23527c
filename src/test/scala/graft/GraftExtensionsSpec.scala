package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("custom expressions are SQL-callable via SparkSessionExtensions") {
    // builder extensions only apply to fresh sessions; in-suite we use the
    // live-session registration path over an isolated child session
    val spark = SparkSuite.session.newSession()
    GraftExtensions.register(spark)
    val z = spark.sql(
      "SELECT zorder_key(20, CAST(3 AS BIGINT), CAST(5 AS BIGINT), CAST(7 AS BIGINT)) AS z")
      .head().getLong(0)
    assert(z == graft.functions.ZOrder.interleave(Array(3L, 5L, 7L), 20))
    val h = spark.sql(
      "SELECT hilbert_key(10, CAST(3 AS BIGINT), CAST(5 AS BIGINT), CAST(7 AS BIGINT)) AS h")
      .head().getLong(0)
    assert(h == graft.functions.Hilbert.index(Array(3L, 5L, 7L), 10))
    val b = spark.sql(
      "SELECT range_bucket(CAST(15 AS BIGINT), CAST(10 AS BIGINT), CAST(20 AS BIGINT)) AS b")
      .head().getInt(0)
    assert(b == 1)
  }
}
