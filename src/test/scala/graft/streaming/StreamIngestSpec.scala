package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.run.Synth
import graft.table.GraftTable

class StreamIngestSpec extends SparkSuite {

  test("file-stream micro-batches become atomic snapshots; restart is idempotent") {
    val inDir = tmpDir("graft-stream-in")
    val root = tmpDir("graft-stream-table")
    val ckpt = tmpDir("graft-stream-ckpt")
    graft.table.FileIO.mkdirs(inDir)
    val t = GraftTable.create(spark, root, Synth.pageSchema)

    // drop two parquet batches into the watched directory
    Synth.pages(spark, 300, partitions = 1, seed = 1).write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(Synth.pageSchema).parquet(inDir)
    val q = StreamIngest.start(t, stream, ckpt, Trigger.AvailableNow())
    q.awaitTermination()
    assert(t.read().count() == 300)
    val snapshotsAfterFirst = t.metadata.snapshots.size

    Synth.pages(spark, 200, partitions = 1, seed = 2).write.mode("append").parquet(inDir)
    val q2 = StreamIngest.start(t,
      spark.readStream.schema(Synth.pageSchema).parquet(inDir), ckpt, Trigger.AvailableNow())
    q2.awaitTermination()
    assert(t.read().count() == 500, "second batch appended exactly once")
    assert(t.metadata.snapshots.size == snapshotsAfterFirst + 1)

    // restart with NO new data: checkpoint prevents re-ingestion
    val q3 = StreamIngest.start(t,
      spark.readStream.schema(Synth.pageSchema).parquet(inDir), ckpt, Trigger.AvailableNow())
    q3.awaitTermination()
    assert(t.read().count() == 500, "restart must not duplicate batches")

    // every stream snapshot carries its batch id in the summary (idempotence key)
    val ids = t.metadata.snapshots.filter(_.operation == "append")
      .flatMap(_.summary.get("stream-batch-id"))
    assert(ids.distinct.size == ids.size && ids.nonEmpty)
  }

  test("legacy (pre-normalization) watermark keys are probed on upgrade") {
    import graft.table.GraftTable
    import graft.run.Synth
    // a checkpoint dir spelled NON-normally keys differently before/after
    // path normalization; the legacy key must still suppress a crash-window
    // batch retry after an engine upgrade
    val ckpt = tmpDir("legacy-ckpt") + "//stream/" // non-normal spelling
    val prop = StreamIngest.batchProperty(ckpt)
    val legacy = StreamIngest.legacyBatchProperties(ckpt)
    assert(legacy.nonEmpty && legacy.head != prop, "spelling must key differently raw vs normalized")
    val t = GraftTable.create(spark, tmpDir("legacy-tbl"), Synth.pageSchema)
    t.append(Synth.pages(spark, 50, partitions = 1))
    // simulate the OLD engine: watermark 5 recorded under the RAW-string key
    t.commitMetadataUpdate(md => md.copy(properties = md.properties + (legacy.head -> "5")))
    val batch = Synth.pages(spark, 10, partitions = 1, seed = 3)
    StreamIngest.appendBatch(t, batch, 5L, prop, legacy) // retry of committed batch
    assert(t.read().count() === 50, "legacy watermark must suppress the replayed batch")
    StreamIngest.appendBatch(t, batch, 6L, prop, legacy) // genuinely new batch
    assert(t.read().count() === 60)
    assert(t.metadata.properties.get(prop).contains("6"), "new appends record the primary key")
    StreamIngest.appendBatch(t, batch, 6L, prop, legacy) // replay under the primary key
    assert(t.read().count() === 60)
  }
}
