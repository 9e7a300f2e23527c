package graft.run

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.table.{DataFileMeta, FileIO, GraftTable, MetaJson, StepLog}

/**
 * Per-partition lineage + metrics rows for every maintenance pass — the
 * engine's replacement for the reference's recon report
 * (`entity/ReconEntity.java:30-42`, printed at
 * `job/TableLoadRunner.java:243-286`): instead of a driver printout, an
 * appendable metrics table (`<root>/metrics/`) holding one row per output
 * file with source-file accounting and the commit snapshot id, so any run is
 * auditable after the fact.
 */
object Lineage {
  final case class LineageRow(
      run_id: String,
      snapshot_id: Long,
      op: String,
      out_path: String,
      rows: Long,
      bytes: Long,
      source_files: Seq[String],
      source_bytes: Long,
      wall_ms: Long,
      committed_ts: java.sql.Timestamp)

  /** Append one lineage row per output file (plus an op-summary row with
    * out_path = ""). Driver-side: row count == output file count. */
  def record(
      spark: SparkSession,
      table: GraftTable,
      runId: String,
      snapshotId: Long,
      op: String,
      outputs: Seq[DataFileMeta],
      sourcesPerOutput: Map[String, Seq[DataFileMeta]],
      wallMs: Long): Unit = {
    import spark.implicits._
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    val rows = outputs.map { o =>
      val srcs = sourcesPerOutput.getOrElse(o.path, Seq.empty)
      LineageRow(runId, snapshotId, op, o.path, o.rows, o.bytes,
        srcs.map(_.path), srcs.map(_.bytes).sum, wallMs, ts)
    }
    val allSources = sourcesPerOutput.values.flatten.toSeq.distinctBy(_.path)
    val summary = LineageRow(runId, snapshotId, op, "",
      outputs.map(_.rows).sum, outputs.map(_.bytes).sum,
      allSources.map(_.path), allSources.map(_.bytes).sum, wallMs, ts)
    spark.createDataset(rows :+ summary).write.mode(SaveMode.Append).parquet(table.metricsDir)
  }

  def metrics(spark: SparkSession, table: GraftTable) =
    spark.read.parquet(table.metricsDir)
}

/** Checkpoint-resume for maintenance passes: a step log per runId under
  * `<root>/maintenance/`, the analog of the reference's timestamp-checkpoint
  * row (`util/TimeStampUtil.java:53-109`) generalized to arbitrary steps. */
object Maintenance {
  private def logPath(table: GraftTable, runId: String) =
    s"${table.root}/maintenance/$runId.json"

  def load(table: GraftTable, runId: String): Option[StepLog] = {
    val p = logPath(table, runId)
    if (FileIO.exists(p)) Some(MetaJson.readStepLog(FileIO.readString(p))) else None
  }

  def start(table: GraftTable, runId: String, op: String): StepLog =
    load(table, runId).getOrElse {
      val log = StepLog(runId, op, System.currentTimeMillis(), Seq.empty, None)
      save(table, log); log
    }

  def save(table: GraftTable, log: StepLog): Unit =
    FileIO.writeString(logPath(table, log.runId), MetaJson.write(log))

  def markDone(table: GraftTable, log: StepLog, step: String): StepLog = {
    val next = log.copy(doneSteps = (log.doneSteps :+ step).distinct)
    save(table, next); next
  }

  def markCommitted(table: GraftTable, log: StepLog, snapshotId: Long): StepLog = {
    val next = log.copy(committedSnapshotId = Some(snapshotId))
    save(table, next); next
  }
}
