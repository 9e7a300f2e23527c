package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth
import graft.table.{GraftTable, PartitionSpec}

/** Bucket-layout migration ([[Rebucket]]): after `SET PARTITION SPEC`
  * evolves the bucket count, migrating the nonconforming files flips the
  * shuffle-free bucketed-scan gate back on — with ZERO shuffle when the old
  * count divides the new one (each old bucket splits locally). */
class RebucketSpec extends SparkSuite {

  private def shuffleBytesDuring(body: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try { body; Thread.sleep(500) } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get()
  }

  test("divisible rebucket 8→16 migrates with ZERO shuffle and restores the gate") {
    val t = GraftTable.create(spark, tmpDir("graft-rebucket-div"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(8, url)"))
    t.append(Synth.pages(spark, 2000, partitions = 4))
    t.setPartitionSpec(Some("bucket(16, url)"))
    t.append(Synth.pages(spark, 600, partitions = 2, seed = 3)
      .withColumn("url", concat(col("url"), lit("?g2"))))

    // mixed generations: gate off, old-gen files nonconforming
    assert(t.bucketSpec().isEmpty, "mixed generations must disable the bucketed scan")
    val before = t.read().localCheckpoint(true)
    val nBad = t.nonconformingFiles().size
    assert(nBad > 0 && nBad < t.files().size, "only the old generation migrates")

    val shuffled = shuffleBytesDuring {
      assert(Rebucket.migrate(t).isDefined)
    }
    // rows of old bucket b can only land in new buckets {b, b+8}: the split
    // is local — nothing may enter a shuffle
    assert(shuffled === 0L, s"divisible rebucket must not shuffle ($shuffled bytes)")

    assert(t.nonconformingFiles().isEmpty)
    val bs = t.bucketSpec()
    assert(bs.exists(b => b.numBuckets == 16 && b.bucketColumnNames == Seq("url")),
      s"gate must report bucket(16, url): $bs")
    assertSameRows(before, t.read(), "after divisible rebucket")
    // and the restored layout is real: groupBy on the key plans no exchange
    val plan = t.read().groupBy("url").agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"post-migration groupBy must not shuffle:\n$plan")
    // second run: everything conforms — no-op
    assert(Rebucket.migrate(t).isEmpty)
  }

  test("non-divisible rebucket 8→12 redistributes each group through one hash exchange") {
    val t = GraftTable.create(spark, tmpDir("graft-rebucket-odd"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(8, url)"))
    t.append(Synth.pages(spark, 1500, partitions = 3))
    t.setPartitionSpec(Some("bucket(12, url)"))
    val before = t.read().localCheckpoint(true)

    assert(Rebucket.migrate(t).isDefined)
    assert(t.nonconformingFiles().isEmpty)
    assert(t.bucketSpec().exists(_.numBuckets == 12))
    assertSameRows(before, t.read(), "after non-divisible rebucket")
  }

  test("pre-spec files migrate; deletion vectors apply and clear in the rewrite") {
    val t = GraftTable.create(spark, tmpDir("graft-rebucket-prespec"), Synth.pageSchema)
    t.append(Synth.pages(spark, 1200, partitions = 2))
    // live DVs on pre-spec files: the migration must materialize them
    val victims = t.read().select("url").orderBy("url").limit(30)
      .collect().map(_.getString(0)).toSet
    assert(t.deleteWherePositional(col("url").isInCollection(victims)).isDefined)
    t.setPartitionSpec(Some("bucket(8, url)"))
    val before = t.read().localCheckpoint(true) // DV-filtered view
    assert(before.filter(col("url").isInCollection(victims)).isEmpty)

    assert(Rebucket.migrate(t).isDefined)
    assert(t.bucketSpec().exists(_.numBuckets == 8))
    assertSameRows(before, t.read(), "after pre-spec migration")
    assert(t.positionDeletes().isEmpty,
      "rewriting every covered file must clear its DV rows")
  }

  test("SQL front door: OPTIMIZE ... REBUCKET") {
    val root = tmpDir("graft-rebucket-sql")
    val t = GraftTable.create(spark, root, Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(4, url)"))
    t.append(Synth.pages(spark, 800, partitions = 2))
    t.setPartitionSpec(Some("bucket(8, url)"))
    val moved = t.nonconformingFiles().size.toLong

    val r = spark.sql(s"OPTIMIZE graft.`$root` REBUCKET").collect()
    assert(r.length == 1 && r(0).getLong(0) > 0 && r(0).getLong(1) == moved, r.mkString)
    assert(GraftTable.load(spark, root).bucketSpec().exists(_.numBuckets == 8))

    // everything conforms now: -1 / 0
    val again = spark.sql(s"OPTIMIZE graft.`$root` REBUCKET").collect()
    assert(again(0).getLong(0) == -1L && again(0).getLong(1) == 0L, again.mkString)
  }

  test("resume after a spec change fails loudly (stale staged groups)") {
    // setPartitionSpec is metadata-only (NO snapshot advance), so the resume
    // guard must key on the active spec too: groups re-derive differently
    // under a new spec, and replaying a staged group under old indexing
    // would commit stale outputs while removing unrewritten files
    val t = GraftTable.create(spark, tmpDir("graft-rebucket-guard"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(4, url)"))
    t.append(Synth.pages(spark, 400, partitions = 2))
    t.setPartitionSpec(Some("bucket(8, url)"))
    val runId = "rb-spec-guard"
    val sp = t.partitionSpecs.find(_.transform == "bucket").get
    val log = graft.run.Maintenance.start(t, runId, "rebucket")
    graft.run.Maintenance.markDone(t, log, s"plan@${t.currentSnapshot.get.id}@$sp")
    // spec changes under the in-flight run (same snapshot id!)
    t.setPartitionSpec(Some("bucket(12, url)"))
    val ex = intercept[IllegalArgumentException] { Rebucket.migrate(t, runId = runId) }
    assert(ex.getMessage.contains("spec changed") || ex.getMessage.contains("fresh run"),
      ex.getMessage)
    // a FRESH run under the new spec is fine
    assert(Rebucket.migrate(t).isDefined)
    assert(t.bucketSpec().exists(_.numBuckets == 12))
  }

  test("migrate without an active bucket transform fails loudly") {
    val t = GraftTable.create(spark, tmpDir("graft-rebucket-nospec"), Synth.pageSchema)
    t.append(Synth.pages(spark, 100, partitions = 1))
    val ex = intercept[IllegalArgumentException] { Rebucket.migrate(t) }
    assert(ex.getMessage.contains("bucket"))
  }
}
