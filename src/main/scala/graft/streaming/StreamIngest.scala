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
    hashProperty(normalized)
  }

  private def hashProperty(key: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    s"stream-batch-${d.take(8).map(b => f"$b%02x").mkString}"
  }

  /** Pre-normalization spelling of the property key, probed as a FALLBACK
    * when the normalized key has no watermark yet: a checkpoint dir spelled
    * non-normally (e.g. '/ckpt/') under a pre-normalization engine version
    * recorded its watermark under the raw-string key — without the probe,
    * an upgrade orphans that watermark and a crash-window batch retry could
    * re-append once. Empty when the raw spelling already IS normal. */
  def legacyBatchProperties(checkpointDir: String): Seq[String] = {
    val primary = batchProperty(checkpointDir)
    val raw = hashProperty(checkpointDir)
    if (raw == primary) Seq.empty else Seq(raw)
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
  def appendBatch(table: GraftTable, batch: DataFrame, batchId: Long, prop: String,
      legacyProps: Seq[String] = Seq.empty): Unit = {
    val md = table.metadata
    // primary key first; legacy (pre-normalization) spellings probed only on
    // miss — the next append records the primary key and the probe goes dead
    val watermark = (prop +: legacyProps).flatMap(md.properties.get).map(_.toLong).maxOption
    val already = watermark match {
      case Some(w) => w >= batchId
      // property absent AND no stream has ever recorded one = table
      // written by a pre-watermark version: fall back to the old
      // per-snapshot summary scan ONCE (the next append records the
      // property and this branch never runs again). If ANY stream has
      // a property, the legacy summaries belong to OTHER streams — the
      // un-keyed fallback would wrongly skip this stream's batch ids.
      // Known upgrade corner (unkeyed legacy summaries make it
      // unresolvable, in BOTH directions): a pre-upgrade stream retrying
      // its crash-window batch AFTER another upgraded stream appended can
      // re-append once; and on a table fed by SEVERAL pre-upgrade streams,
      // a crash-window retry can be wrongly SKIPPED when another stream's
      // legacy summary carries the same bare batch id. Upgrade a table's
      // streams together, or let each drain before upgrading the next.
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
    val legacy = legacyBatchProperties(checkpointDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(table, batch, batchId, prop, legacy)
      }
      .start()
  }
}
