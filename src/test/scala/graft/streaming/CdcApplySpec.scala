package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth
import graft.table.{Changelog, GraftTable, PartitionSpec}

/**
 * Distributed CDC apply ([[CdcApply]]): a change-rows stream from one graft
 * table maintains a downstream graft table exactly — including a bucketed
 * downstream, where each batch lands as a bucket-aware merge (target side of
 * the join shuffle-free, no output exchange).
 */
class CdcApplySpec extends SparkSuite {

  private def pages(n: Long, seed: Long): DataFrame =
    Synth.pages(spark, n, partitions = 2, seed = seed)

  private def drainInto(src: String, target: GraftTable, ckpt: String): Unit = {
    val q = CdcApply.start(target,
      spark.readStream.format("graft").option("change-rows", "true").load(src),
      ckpt, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try { q.processAllAvailable() } finally { q.stop() }
  }

  test("change-rows stream maintains a bucketed downstream table exactly") {
    val srcRoot = tmpDir("graft-cdcapply-src")
    val ckpt = tmpDir("graft-cdcapply-ckpt")
    val a = GraftTable.create(spark, srcRoot, Synth.pageSchema)
    a.append(pages(120, 1))

    val b = GraftTable.create(spark, tmpDir("graft-cdcapply-tgt"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(8, url)"))

    // initial snapshot arrives as insert events → bootstrap merge
    drainInto(srcRoot, b, ckpt)
    assertSameRows(a.read(), b.read(), "after initial load")
    assert(b.bucketSpec().isDefined, "bootstrap merge must keep the bucket layout")

    // while the stream is down: the full row-changing mix — a CoW merge
    // (updates + deletes + inserts), a MoR tombstone delete, a plain append
    import spark.implicits._
    val cur = a.read().as[(String, java.sql.Timestamp, Array[Byte], String, String)]
      .collect().map(r => r._1 -> r).toMap
    val ks = cur.keys.toSeq.sorted
    val changes = ks.take(10).map { u => val o = cur(u)
        (u, new java.sql.Timestamp(o._2.getTime + 1000L), o._3, "UPD", o._5, false) }
      .++(ks.slice(20, 26).map { u => val o = cur(u)
        (u, new java.sql.Timestamp(o._2.getTime + 1000L), o._3, "D", o._5, true) })
      .++((0 until 7).map(i => (s"https://new.example.com/$i",
        new java.sql.Timestamp(1735689600000L), Array[Byte](1), s"NEW$i", "en", false)))
      .toDF("url", "warc_ts", "html", "text", "lang", "_deleted")
    graft.ops.Merge.into(a, changes, Seq("url"))
    a.deleteByKeysMoR(a.read().select("url").orderBy(desc("url")).limit(4))
    a.append(pages(20, 9).withColumn("url", concat(col("url"), lit("?z"))))

    drainInto(srcRoot, b, ckpt)
    assertSameRows(a.read(), b.read(), "after merge+MoR-delete+append")
    assert(b.bucketSpec().isDefined, "applied merges must keep the bucket layout")

    // idle restart delivers nothing and commits nothing
    val versions = b.metadata.snapshots.size
    drainInto(srcRoot, b, ckpt)
    assert(b.metadata.snapshots.size == versions, "idle restart must not commit")
  }

  test("applyBatch is exactly-once: a replayed batch id is skipped before any work") {
    val a = GraftTable.create(spark, tmpDir("graft-cdcapply-once-src"), Synth.pageSchema)
    a.append(pages(40, 3))
    val b = GraftTable.create(spark, tmpDir("graft-cdcapply-once-tgt"), Synth.pageSchema)

    val batch = a.changes(0).localCheckpoint(true) // full changelog as one batch
    val prop = StreamIngest.batchProperty("/ckpt/cdc-once")
    CdcApply.applyBatch(b, batch, 0L, prop, Seq("url"))
    assertSameRows(a.read(), b.read(), "after first apply")
    val versions = b.metadata.snapshots.size
    assert(b.metadata.properties.get(prop).contains("0"),
      "merge commit must carry the batch watermark")

    // crash-window replay: same batch id again → skipped, no new snapshot
    CdcApply.applyBatch(b, batch, 0L, prop, Seq("url"))
    assert(b.metadata.snapshots.size == versions, "replayed batch must be a no-op")
    assertSameRows(a.read(), b.read(), "after replay")
  }

  test("foldBatch nets a key's events to its final image; update images fold to the post-image") {
    import spark.implicits._
    // key k1: insert@1 then delete@2 → deleted; k2: delete pre + insert post
    // @2 (an update pair) → live post-image; k3: insert@3 only → live
    val batch = Seq(
      ("k1", "a", "insert", 1L),
      ("k1", "a", "delete", 2L),
      ("k2", "old", Changelog.UpdatePreimage, 2L),
      ("k2", "new", Changelog.UpdatePostimage, 2L),
      ("k3", "c", "insert", 3L)
    ).toDF("url", "text", Changelog.ChangeTypeCol, Changelog.CommitCol)
    val folded = CdcApply.foldBatch(batch, Seq("url"))
      .select("url", "text", "_deleted").as[(String, String, Boolean)]
      .collect().sortBy(_._1)
    assert(folded === Array(("k1", "a", true), ("k2", "new", false), ("k3", "c", false)))
    // a non-changelog frame fails loudly
    val ex = intercept[IllegalArgumentException] {
      CdcApply.foldBatch(Seq(("k", 1)).toDF("url", "n"), Seq("url"))
    }
    assert(ex.getMessage.contains("change-rows"))
  }

  test("bucketed apply merges shuffle only the change rows") {
    val a = GraftTable.create(spark, tmpDir("graft-cdcapply-shuf-src"), Synth.pageSchema)
    a.append(pages(400, 5))
    val b = GraftTable.create(spark, tmpDir("graft-cdcapply-shuf-tgt"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(8, url)"))
    val ckpt = tmpDir("graft-cdcapply-shuf-ckpt")
    drainInto(a.root, b, ckpt) // bootstrap: b is bucketed and fully stamped

    // a small update batch against the 400-row target
    val upd = a.read().limit(12)
      .withColumn("warc_ts", col("warc_ts") + expr("interval 100 days"))
      .withColumn("text", lit("v2")).localCheckpoint(true)
    graft.ops.Merge.into(a, upd, Seq("url"))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      drainInto(a.root, b, ckpt)
      Thread.sleep(500) // let the listener bus drain the final task events
    } finally spark.sparkContext.removeSparkListener(listener)
    assertSameRows(a.read(), b.read(), "after bucketed apply")
    // the touched target bytes never enter a shuffle: everything shuffled
    // (changelog diff fingerprints + the folded change rows) stays far below
    // the target's data size
    val targetBytes = b.files().map(_.bytes).sum
    assert(shuffleBytes.get() < targetBytes / 2,
      s"bucketed apply shuffled ${shuffleBytes.get()} bytes vs target $targetBytes")
  }
}
