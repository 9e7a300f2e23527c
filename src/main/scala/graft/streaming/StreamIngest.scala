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

  /** Table-property key holding the last committed batch id of one stream
    * (keyed by checkpoint dir, so several streams can feed one table; md5 —
    * a 32-bit hashCode collision would silently cross the streams'
    * watermarks and skip batches). The path is NORMALIZED first (trailing
    * slashes, duplicate separators): Spark resumes the same checkpoint for
    * "/ckpt" and "/ckpt/", so a respelled restart must hit the same
    * watermark property or the crash-window batch re-appends. (A scheme-
    * qualified respelling like "file:/ckpt" still keys separately —
    * qualification would change every existing table's property names.) */
  def batchProperty(checkpointDir: String): String = {
    val normalized = scala.util.Try(
      new org.apache.hadoop.fs.Path(checkpointDir).toString).getOrElse(checkpointDir)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(normalized.getBytes("UTF-8"))
    s"stream-batch-${d.take(8).map(b => f"$b%02x").mkString}"
  }

  /**
   * Idempotently append one micro-batch — shared by the `foreachBatch`
   * ingestion below and the DSv1 sink ([[GraftStreamSink]]).
   *
   * Idempotence: Spark may retry a batch after a crash between the sink
   * commit and the checkpoint write. Batch ids are monotonic per
   * checkpoint, so ONE high-watermark table property is the whole dedup
   * state — an O(1) lookup however long the snapshot history grows, and it
   * survives snapshot expiry (the previous per-snapshot summary scan was
   * O(history) per micro-batch and forgot committed ids once expiry aged
   * their snapshots out).
   */
  def appendBatch(table: GraftTable, batch: DataFrame, batchId: Long, prop: String): Unit = {
    val md = table.metadata
    val already = md.properties.get(prop) match {
      case Some(w) => w.toLong >= batchId
      // property absent AND no stream has ever recorded one = table
      // written by a pre-watermark version: fall back to the old
      // per-snapshot summary scan ONCE (the next append records the
      // property and this branch never runs again). If ANY stream has
      // a property, the legacy summaries belong to OTHER streams — the
      // un-keyed fallback would wrongly skip this stream's batch ids.
      // Known upgrade corner (unkeyed legacy summaries make it
      // unresolvable): a pre-upgrade stream retrying its crash-window
      // batch AFTER another upgraded stream has already appended can
      // re-append once — upgrade a table's streams together, or let
      // each drain before upgrading the next.
      case None =>
        !md.properties.keys.exists(_.startsWith("stream-batch-")) &&
          md.snapshots.exists(_.summary.get("stream-batch-id").contains(batchId.toString))
    }
    if (!already) {
      // pin before probing: isEmpty + append would otherwise execute the
      // batch plan twice (re-reading the source files per trigger for a
      // graft-to-graft pipe, and re-rolling any nondeterministic transform)
      val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (!pinned.isEmpty) {
          table.append(pinned, Map("stream-batch-id" -> batchId.toString),
            propertyUpdates = Map(prop -> batchId.toString))
          ()
        }
      } finally { pinned.unpersist(); () }
    }
  }

  /** Start ingesting `stream` (must match the table schema) into `table`.
    * `checkpointDir` carries source offsets AND the last committed batch id. */
  def start(
      table: GraftTable,
      stream: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val prop = batchProperty(checkpointDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(table, batch, batchId, prop)
      }
      .start()
  }
}
