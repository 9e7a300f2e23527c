package graft.table

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.databind.annotation.JsonDeserialize
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}

/**
 * Metadata model of the graft table format — a from-scratch, Iceberg-style
 * snapshot/manifest layer over Parquet data files.
 *
 * Re-imagines the reference's schema-mediated table abstraction
 * (HBase-To-Hive `hbase/HBaseTableIR` + checkpoint rows in
 * `util/TimeStampUtil.java:53-109`) as immutable snapshot metadata with an
 * atomic version-pointer swap, replacing the reference's DROP/RENAME table
 * swap (`hive/HiveTableIR.java:296-299`).
 *
 * Layout under a table root:
 * {{{
 *   data/<commit-uuid>/part-*.parquet        immutable data files
 *   metadata/v<N>.json                       full table metadata, version N
 *   metadata/manifest-<uuid>.json            list of DataFileMeta (JSON lines)
 *   metrics/                                 lineage/metrics parquet table
 *   maintenance/<runId>.json                 resumable step logs
 * }}}
 *
 * All values in `minValues`/`maxValues` are stored as canonical strings and
 * compared after parsing with the table schema (see [[Bounds]]); timestamps
 * are epoch micros, dates epoch days.
 */
final case class DataFileMeta(
    path: String, // relative to table root
    rows: Long,
    bytes: Long,
    minValues: Map[String, String],
    maxValues: Map[String, String],
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    nullCounts: Map[String, Long],
    commitUuid: String)

final case class ManifestMeta(
    path: String, // relative to table root
    fileCount: Int,
    rows: Long,
    bytes: Long)

final case class Snapshot(
    id: Long,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | compact | cluster | merge | delete-mor | expire | rewrite-manifests | rewrite-deletes | …
    manifests: Seq[ManifestMeta],
    summary: Map[String, String],
    // merge-on-read equality-delete (tombstone) manifests; Option so
    // pre-MoR metadata JSON deserializes as None
    deleteManifests: Option[Seq[ManifestMeta]] = None,
    // merge-on-read POSITION-delete (deletion-vector) manifests: parquet
    // files of (_file, _pos) rows naming deleted row positions of specific
    // data files. File-scoped (later appends unaffected) and exactly
    // clearable per rewritten file — unlike equality tombstones. Option so
    // pre-DV metadata JSON deserializes as None
    posDeleteManifests: Option[Seq[ManifestMeta]] = None) {
  def deleteManifestList: Seq[ManifestMeta] = deleteManifests.getOrElse(Seq.empty)
  def posDeleteList: Seq[ManifestMeta] = posDeleteManifests.getOrElse(Seq.empty)
}

/** Named snapshot reference: pins `snapshotId` against expiry and names it
  * for time travel (`VERSION AS OF 'name'`). `kind` is "tag" (immovable) or
  * "branch" (moved by staged commits). For a branch, `baseSnapshotId`
  * records where it diverged from main: expiry pins the staged chain
  * head→base so a mid-staging VACUUM can never break the fast-forward
  * ancestry walk. */
final case class RefMeta(
    snapshotId: Long,
    kind: String = "tag",
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    baseSnapshotId: Option[Long] = None)

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    schemaDdl: String, // StructType.toDDL (kept for readability/back-compat)
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    lastSnapshotId: Long,
    properties: Map[String, String],
    // StructType.json — unlike toDDL it preserves per-field metadata, which
    // carries the stable parquet field ids that make rename/drop column
    // evolution readable across old files; None on pre-evolution metadata
    schemaJson: Option[String] = None,
    // named snapshot refs; Option so pre-refs metadata JSON deserializes
    refs: Option[Map[String, RefMeta]] = None) {
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.id == id))
  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.id == id)
  def refMap: Map[String, RefMeta] = refs.getOrElse(Map.empty)
}

object MetaJson {
  private val mapper: ObjectMapper with ClassTagExtensions = {
    val m = new ObjectMapper() with ClassTagExtensions
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  def write(v: Any): String = mapper.writeValueAsString(v)
  def readTableMetadata(s: String): TableMetadata = mapper.readValue[TableMetadata](s)
  def readDataFileMeta(s: String): DataFileMeta = mapper.readValue[DataFileMeta](s)
  def readStepLog(s: String): StepLog = mapper.readValue[StepLog](s)
}

/** Typed row of the web-page table (field names/order = the canonical
  * `(url, warc_ts, html, text, lang)` schema; see `Synth.pageSchema`). */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Resumable maintenance-run step log (checkpoint-resume per north rule). */
final case class StepLog(
    runId: String,
    op: String,
    startedMs: Long,
    doneSteps: Seq[String],
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    committedSnapshotId: Option[Long])
