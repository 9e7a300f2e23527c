package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.GraftTable

/**
 * Structured-Streaming ingestion into a graft table.
 *
 * Re-imagines the reference's checkpointed incremental batch loop
 * (`util/TimeStampUtil.java:53-109` — a timestamp row in HBase + manual
 * re-runs) as a real streaming pipeline: the source watermark/offset
 * tracking comes from Spark's checkpoint, and each micro-batch becomes one
 * atomic table snapshot via `foreachBatch` → `table.append`, so readers are
 * snapshot-isolated from in-flight batches and a crashed job resumes from
 * its checkpoint without duplicating committed batches (the epoch guard
 * below makes the append idempotent per batch id).
 */
object StreamIngest {

  /** Start ingesting `stream` (must match the table schema) into `table`.
    * `checkpointDir` carries source offsets AND the last committed batch id. */
  def start(
      table: GraftTable,
      stream: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotence: Spark may retry a batch after a crash between the
        // sink commit and the checkpoint write; the snapshot summary records
        // the batch id so a re-delivered batch is skipped, not re-appended
        val already = table.metadata.snapshots.exists(
          _.summary.get("stream-batch-id").contains(batchId.toString))
        if (!already && !batch.isEmpty) {
          table.append(batch, Map("stream-batch-id" -> batchId.toString))
          ()
        }
      }
      .start()
  }
}
