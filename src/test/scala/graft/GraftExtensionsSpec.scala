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

  test("text/vector kernels are SQL-callable") {
    val spark = SparkSuite.session.newSession()
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT lang_id('der hund und die katze ist') AS l")
      .head().getString(0) == "de")
    assert(spark.sql("SELECT size(shingle_hashes('a b c d e', 3)) AS n")
      .head().getInt(0) == 3)
    assert(spark.sql("SELECT size(minhash_sig(shingle_hashes('a b c d e', 3), 16)) AS n")
      .head().getInt(0) == 16)
    assert(spark.sql("SELECT simhash64('x y z') = simhash64('x y z') AS eq")
      .head().getBoolean(0))
    assert(math.abs(spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c")
      .head().getDouble(0) - 1.0) < 1e-9)
    val s = spark.sql("SELECT hyperplane_sig(array(0.5d, -0.25d, 1.0d), 16) AS s")
      .head().getLong(0)
    assert(s == spark.sql("SELECT hyperplane_sig(array(0.5d, -0.25d, 1.0d), 16) AS s")
      .head().getLong(0))
  }
}
