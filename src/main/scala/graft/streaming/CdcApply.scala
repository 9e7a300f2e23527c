package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Merge
import graft.table.{Changelog, GraftTable}

/**
 * Distributed CDC apply: consume a `change-rows` changelog stream (from
 * [[GraftStreamSource]], see [[graft.table.Changelog]]) and maintain a
 * DOWNSTREAM graft table as an exact replica-with-transforms of the source —
 * the set-based, streaming form of the reference's split `insert_*`/
 * `delete_*` HDFS files plus hand-run Hive merge scripts
 * (`adapter/HdfsTargetAdapter.java:37-152`): there the consumer was a
 * script folding delete files into the warehouse table; here each
 * micro-batch folds to one net row image per key and lands as ONE atomic
 * MERGE commit, exactly once across restarts.
 *
 * Scale shape: a batch holds the row CHANGES of a commit range, never the
 * table, so the fold (one window over the batch) and the merge source are
 * change-sized. The merge itself is [[Merge.into]], so a target bucketed on
 * the key applies every batch with the table-side join shuffle-free and no
 * output exchange — the change rows are the only bytes that move, which is
 * what lets one 100 TB source fan out to co-bucketed downstream tables at
 * change-rate cost.
 *
 * Exactly-once: Spark may replay a batch after a crash between the merge
 * commit and the checkpoint write. The last applied batch id rides the
 * merge commit itself as a table-property watermark
 * ([[StreamIngest.batchProperty]] — same key scheme as the append sink, so
 * the guard is atomic with the data), and a replayed batch id at-or-below
 * the watermark is skipped before any work runs.
 */
object CdcApply {

  /** Fold a change-rows micro-batch (the events of one or more commits) to
    * at most ONE net row image per key, in [[Merge.into]] source form.
    *
    * Per key, the LAST event in (commit, liveness) order wins: events of a
    * later commit supersede earlier ones, and within a single commit the
    * live image (`insert` / `update_postimage`) outranks the dead one
    * (`delete` / `update_preimage`) — an in-place update is a
    * delete+insert pair at the same commit id, whose net effect is the
    * post-image. A key whose final event is dead folds to `_deleted=true`
    * (the merge's delete marker); dead rows for keys absent from the
    * target are no-ops by merge semantics, so replays of already-applied
    * deletes are harmless.
    *
    * The fold assumes the source keeps at most one live row per key (a
    * merge-maintained table) — duplicate live rows per key would fold to
    * an arbitrary one, and [[Merge.into]]'s ANSI cardinality check cannot
    * see the dropped sibling. */
  def foldBatch(batch: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(batch.columns.contains(Changelog.ChangeTypeCol) &&
      batch.columns.contains(Changelog.CommitCol),
      s"not a change-rows batch: expected ${Changelog.ChangeTypeCol} and " +
        s"${Changelog.CommitCol} columns (readStream with option change-rows=true)")
    val live = col(Changelog.ChangeTypeCol)
      .isin("insert", Changelog.UpdatePostimage)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(Changelog.CommitCol).desc, live.cast("int").desc)
    batch
      .withColumn("_live", live)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .withColumn("_deleted", !col("_live"))
      .drop("_rn", "_live", Changelog.ChangeTypeCol, Changelog.CommitCol)
  }

  /** Idempotently apply one micro-batch: watermark check, fold, one MERGE
    * commit carrying the new watermark. Shared by [[start]] and direct
    * `foreachBatch` wiring (when the consumer transforms the batch first —
    * the transform must be row-wise, preserving the changelog columns). */
  def applyBatch(
      target: GraftTable,
      batch: DataFrame,
      batchId: Long,
      prop: String,
      keyCols: Seq[String],
      legacyProps: Seq[String] = Seq.empty,
      mode: String = "copy-on-write"): Unit = {
    val md = target.metadata
    val watermark = (prop +: legacyProps).flatMap(md.properties.get).map(_.toLong).maxOption
    if (watermark.exists(_ >= batchId)) return
    // pin before probing: isEmpty + merge would execute the fold (and the
    // changelog diff subplans feeding it) twice per trigger
    val folded = foldBatch(batch, keyCols)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!folded.isEmpty) {
        Merge.into(target, folded, keyCols,
          latestWins = false, // the fold already ordered by commit — ANSI apply
          mode = mode,
          propertyUpdates = Map(prop -> batchId.toString))
        ()
      }
      // an all-events-cancel batch commits nothing and records no watermark:
      // its replay re-folds to empty and skips again — idempotent without it
    } finally { folded.unpersist(); () }
  }

  /** Start applying `changes` (a streaming frame from
    * `spark.readStream.format("graft").option("change-rows", "true")`, or a
    * row-wise transform of one) into `target` on `keyCols`. `checkpointDir`
    * carries the source offsets AND keys the target's batch watermark. */
  def start(
      target: GraftTable,
      changes: DataFrame,
      checkpointDir: String,
      keyCols: Seq[String] = Seq("url"),
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      mode: String = "copy-on-write"): StreamingQuery = {
    val prop = StreamIngest.batchProperty(checkpointDir)
    val legacy = StreamIngest.legacyBatchProperties(checkpointDir)
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(target, batch, batchId, prop, keyCols, legacy, mode)
      }
      .start()
  }
}
