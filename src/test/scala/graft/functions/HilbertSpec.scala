package graft.functions

import scala.util.Random

import graft.SparkSuite

class HilbertSpec extends SparkSuite {
  private val rnd = new Random(7)
  private val bits = 10
  private def dim(): Long = rnd.nextLong() & ((1L << bits) - 1)

  test("index/coords are inverse bijections") {
    for (_ <- 1 to 20000) {
      val d = Array(dim(), dim(), dim())
      val h = Hilbert.index(d, bits)
      assert(Hilbert.coords(h, 3, bits).toSeq == d.toSeq)
    }
  }

  test("curve property: consecutive indices are grid-adjacent (unit step)") {
    // THE Hilbert-curve defining property — Morton order violates it
    for (_ <- 1 to 5000) {
      val h = math.abs(rnd.nextLong()) % ((1L << (3 * bits)) - 1)
      val a = Hilbert.coords(h, 3, bits)
      val b = Hilbert.coords(h + 1, 3, bits)
      val manhattan = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(manhattan == 1, s"h=$h: ${a.toSeq} -> ${b.toSeq}")
    }
  }

  test("codegen'd expression equals interpreted eval") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.range(500).select(
      pmod(xxhash64(col("id"), lit(1)), lit(1L << bits)).as("d1"),
      pmod(xxhash64(col("id"), lit(2)), lit(1L << bits)).as("d2"),
      pmod(xxhash64(col("id"), lit(3)), lit(1L << bits)).as("d3"))
    val got = df.select(Hilbert.key(bits, col("d1"), col("d2"), col("d3")).as("h"),
      col("d1"), col("d2"), col("d3")).as[(Long, Long, Long, Long)].collect()
    got.foreach { case (h, d1, d2, d3) =>
      assert(h == Hilbert.index(Array(d1, d2, d3), bits))
    }
  }

  test("hilbert clustering end-to-end: rows identical, pruning works") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("graft-hilbert")
    val t = graft.table.GraftTable.create(spark, root, graft.run.Synth.pageSchema)
    t.append(graft.run.Synth.pages(spark, 8000, hosts = 50, partitions = 8))
    val pre = t.read()
    val snap = graft.ops.Cluster.zorderRewrite(t,
      graft.ops.Cluster.ZDims(curve = "hilbert"), targetFileBytes = 256L * 1024)
    assert(snap.nonEmpty && snap.get.summary("curve") == "hilbert")
    assertSameRows(t.read(), pre, "hilbert cluster")
    val all = t.files().size
    val planned = t.planFiles(Some(col("lang") === "de")).size
    assert(all > 2 && planned < all, s"hilbert pruning: $planned/$all")
  }
}
