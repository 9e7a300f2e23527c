package graft.functions

import scala.util.Random

import graft.SparkSuite

class ZOrderSpec extends SparkSuite {

  private val rnd = new Random(42)
  private def dim(): Long = rnd.nextLong() & ((1L << 20) - 1)

  test("interleave is injective over 3x20-bit dims (bijectivity)") {
    val seen = scala.collection.mutable.HashMap.empty[Long, (Long, Long, Long)]
    for (_ <- 1 to 20000) {
      val (a, b, c) = (dim(), dim(), dim())
      val z = ZOrder.interleave(Array(a, b, c), 20)
      seen.get(z).foreach(prev => assert(prev == ((a, b, c)), s"collision at $z"))
      seen(z) = (a, b, c)
      // round-trip: deinterleave by re-extracting bits
      var (ra, rb, rc) = (0L, 0L, 0L)
      for (bit <- 19 to 0 by -1) {
        ra = (ra << 1) | ((z >>> (bit * 3 + 2)) & 1)
        rb = (rb << 1) | ((z >>> (bit * 3 + 1)) & 1)
        rc = (rc << 1) | ((z >>> (bit * 3)) & 1)
      }
      assert((ra, rb, rc) == ((a, b, c)), "interleave must be invertible")
    }
  }

  test("interleave is monotone per dimension when others fixed") {
    for (_ <- 1 to 20000) {
      val (x, y, d2, d3) = (dim(), dim(), dim(), dim())
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      assert(ZOrder.interleave(Array(lo, d2, d3), 20) <= ZOrder.interleave(Array(hi, d2, d3), 20))
      assert(ZOrder.interleave(Array(d2, lo, d3), 20) <= ZOrder.interleave(Array(d2, hi, d3), 20))
      assert(ZOrder.interleave(Array(d2, d3, lo), 20) <= ZOrder.interleave(Array(d2, d3, hi), 20))
    }
  }

  test("interleave bit layout: dim0 owns the MSB") {
    val z = ZOrder.interleave(Array((1L << 20) - 1, 0L, 0L), 20)
    assert((z >>> 59) == 1L) // bit 59 = dim0 MSB for 3 dims * 20 bits
    assert(ZOrder.interleave(Array(0L, 0L, 0L), 20) == 0L)
  }

  test("codegen'd expression equals interpreted eval and stays in codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).select(
      pmod(xxhash64(col("id"), lit(1)), lit(1L << 20)).as("d1"),
      pmod(xxhash64(col("id"), lit(2)), lit(1L << 20)).as("d2"),
      pmod(xxhash64(col("id"), lit(3)), lit(1L << 20)).as("d3"))
    val got = df.select(ZOrder.zkey(20, col("d1"), col("d2"), col("d3")).as("z"),
      col("d1"), col("d2"), col("d3")).as[(Long, Long, Long, Long)].collect()
    got.foreach { case (z, d1, d2, d3) =>
      assert(z == ZOrder.interleave(Array(d1, d2, d3), 20))
    }
    // "*(n)" prefixes mark whole-stage-codegen'd operators in the plan string
    val plan = df.select(ZOrder.zkey(20, col("d1"), col("d2"), col("d3")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"zkey must not break codegen:\n$plan")
  }

  test("rangeDim keeps full resolution at high magnitudes and wide spans") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // narrow span at 2^62 (where sortable-bits double encodings live): a
    // floating-point division would quantize to 512-step units and collapse
    // the dim to ~2 values; the integral-divide path must keep all 1000
    val base = 1L << 62
    val df = spark.range(1000).select((lit(base) + col("id")).as("v"))
    val narrow = df.select(ZOrder.rangeDim(col("v"), base, base + 999, 20).as("d"))
      .as[Long].collect()
    assert(narrow.distinct.length == 1000, s"collapsed to ${narrow.distinct.length} values")
    assert(narrow.min >= 0 && narrow.max <= (1L << 20) - 1)
    assert(narrow.sorted.sameElements(narrow), "must be monotone in v")

    // full-Long span (min<0<max, |span| > 2^63): must neither overflow (ANSI)
    // nor leave the dim constant
    val wide = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue).toDF("v")
      .select(ZOrder.rangeDim(col("v"), Long.MinValue, Long.MaxValue, 20).as("d"))
      .as[Long].collect()
    assert(wide.distinct.length >= 3 && wide.sorted.sameElements(wide), wide.mkString(","))
    assert(wide.forall(d => d >= 0 && d <= (1L << 20) - 1))
  }

  test("prefixDim is order-preserving on ASCII strings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val strs = (1 to 300).map(_ => rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
    val dims = strs.toDF("s").select(col("s"), ZOrder.prefixDim(col("s"), 20, 8).as("d"))
      .as[(String, Long)].collect().toMap
    for (a <- strs; b <- strs) {
      if (a.take(8) < b.take(8)) assert(dims(a) <= dims(b), s"'$a' vs '$b'")
    }
  }
}
