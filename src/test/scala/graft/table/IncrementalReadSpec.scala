package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Compact, Merge}
import graft.run.Synth

/**
 * CDC-style incremental read over the snapshot chain — the precise
 * replacement for the reference's timestamp-checkpoint incremental load
 * (re-scan a time window, `util/TimeStampUtil.java:53-109`): appends name
 * their files exactly, row-preserving rewrites are transparent,
 * row-changing commits refuse a file-level diff.
 */
class IncrementalReadSpec extends SparkSuite {

  private def batch(tag: String, n: Int) =
    Synth.pages(spark, n, hosts = 5, partitions = 2)
      .withColumn("url", concat(lit(s"$tag/"), col("url")))

  test("incremental read returns exactly the rows appended after a snapshot") {
    val tbl = GraftTable.create(spark, tmpDir("incr"), Synth.pageSchema)
    val s1 = tbl.append(batch("a", 300)).id
    val s2 = tbl.append(batch("b", 200)).id
    Compact.run(tbl, targetBytes = 1L << 30) // row-preserving rewrite
    val s4 = tbl.append(batch("c", 100)).id

    val incr = tbl.incrementalRead(s1)
    assert(incr.count() === 300, "b (200) + c (100) appended after s1")
    assert(incr.filter(col("url").startsWith("a/")).count() === 0)

    // bounded range covering only the compaction → empty
    assert(tbl.incrementalRead(s2, Some(s4 - 1)).count() === 0)
    // from == to → empty
    assert(tbl.incrementalRead(s4, Some(s4)).count() === 0)
    // from the beginning (0 = before the first snapshot) → everything
    assert(tbl.incrementalRead(0).count() === 600)
    // appended rows equal a full-scan diff of the two snapshots
    assertSameRows(
      tbl.incrementalRead(s2),
      tbl.read().exceptAll(tbl.readSnapshot(s2)),
      "incremental vs snapshot diff")
  }

  test("row-changing commits refuse a file-level incremental read") {
    val tbl = GraftTable.create(spark, tmpDir("incr-merge"), Synth.pageSchema)
    val s1 = tbl.append(batch("a", 200)).id
    val changes = tbl.read().limit(10)
      .withColumn("text", lit("rewritten"))
      .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 1 DAY"))
    Merge.into(tbl, changes)
    val ex = intercept[IllegalArgumentException](tbl.incrementalRead(s1).count())
    assert(ex.getMessage.contains("row-changing"))
  }

  test("expired from-snapshot is rejected") {
    val tbl = GraftTable.create(spark, tmpDir("incr-expired"), Synth.pageSchema)
    tbl.append(batch("a", 50))
    val ex = intercept[IllegalArgumentException](tbl.incrementalRead(99L))
    assert(ex.getMessage.contains("unknown or expired"))
  }
}
