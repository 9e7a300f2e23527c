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
}
