package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The double→Long sortable encoding behind double/float merge-key range
  * steering: signed-order-preserving, codegen'd, bit-identical to the
  * Scala-side encoder used on metadata bound strings. */
class SortableBitsSpec extends SparkSuite {

  test("encoding is order-preserving over randoms, negatives, zeros, extremes") {
    val rnd = new scala.util.Random(42)
    val vs = (Seq.fill(2000)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(20) - 10)) ++
      Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
        Double.MaxValue, Double.MinValue, 1e-300, -1e-300)).sorted
    vs.sliding(2).foreach { case Seq(a, b) =>
      assert(SortableBits.encode(a) <= SortableBits.encode(b),
        s"order broken: $a -> ${SortableBits.encode(a)} vs $b -> ${SortableBits.encode(b)}")
      ()
    }
    // strictly monotonic where the doubles differ (excluding the ±0.0 pair)
    assert(SortableBits.encode(-1.5) < SortableBits.encode(-1.0))
    assert(SortableBits.encode(-1.0) < SortableBits.encode(0.0))
    assert(SortableBits.encode(0.0) < SortableBits.encode(1.0))
  }

  test("codegen'd expression equals the Scala encoder; stays in codegen") {
    import spark.implicits._
    // spark.range leaf: a local Seq would be constant-folded to
    // LocalTableScan by ConvertToLocalRelation before codegen is planned
    val df = spark.range(2000).select(
      (rand(7) * 2e6 - 1e6).as("x"))
    val got = df.select(col("x"), SortableBits(col("x")).as("e")).as[(Double, Long)].collect()
    got.foreach { case (x, e) => assert(e == SortableBits.encode(x), s"mismatch at $x") }
    val plan = df.select(SortableBits(col("x"))).queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"sortable_bits must not break codegen:\n$plan")
    // null propagation
    val n = df.select(SortableBits(when(col("x") > 2e6, col("x"))).as("e"))
      .filter(col("e").isNull).count()
    assert(n == 2000L)
  }
}
