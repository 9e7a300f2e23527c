package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeShuffleSpec extends SparkSuite {
  import spark.implicits._

  test("tokens steer each bucket into exactly its own hash partition") {
    val n = 37
    val tok = RangeShuffle.tokens(n)
    val df = tok.toSeq.toDF("t").repartition(n, col("t"))
      .select(col("t"), spark_partition_id().as("pid"))
    val got = df.as[(Int, Int)].collect().toMap
    tok.zipWithIndex.foreach { case (t, i) =>
      assert(got(t) == i, s"token $t should land in partition $i, got ${got(t)}")
    }
  }

  test("byRange: partitions are range-disjoint, ordered, and balanced") {
    val df = spark.range(100000).select(
      (xxhash64(col("id")) % 1000000).as("k"), col("id"))
    val bds = RangeShuffle.boundaries(df, col("k"), 16, 100000)
    assert(bds.length == 15)
    val parts = RangeShuffle.byRange(df, col("k"), bds)
      .select(spark_partition_id().as("pid"), col("k"))
      .groupBy("pid").agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .orderBy("pid").as[(Int, Long, Long, Long)].collect()
    assert(parts.length == 16)
    // ranges are disjoint and ascending with partition id
    parts.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"partition ${a._1} range overlaps ${b._1}")
    }
    // equi-depth: no partition more than 3x the mean
    val mean = parts.map(_._4).sum / parts.length
    assert(parts.forall(_._4 < mean * 3), s"imbalanced: ${parts.map(_._4).toSeq}")
  }

  test("single-scan property: no extra full-child job for sampling") {
    // structural check: the byRange plan contains exactly one Exchange and
    // it is hash partitioning (the steered one), not range partitioning
    val df = spark.range(10000).select(col("id").as("k"))
    val bds = RangeShuffle.boundaries(df, col("k"), 8, 10000)
    val plan = RangeShuffle.byRange(df, col("k"), bds).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning") || plan.contains("Exchange"))
    assert(!plan.contains("rangepartitioning"), s"must not range-partition:\n$plan")
  }
}
