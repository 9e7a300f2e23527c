package graft.table

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * The graft table: Parquet data files under an immutable snapshot/manifest
 * metadata layer with optimistic-concurrency commits.
 *
 * This is the engine's answer to the reference's whole pipeline: where
 * HBase-To-Hive moves rows between live stores with a checkpoint row
 * (`util/TimeStampUtil.java:53-109`) and commits by DROP/RENAME
 * (`hive/HiveTableIR.java:296-299`), here every maintenance pass writes new
 * immutable files and atomically swaps a metadata pointer, so concurrent
 * readers are snapshot-isolated by construction.
 *
 * Scale notes (designed for ~10^5 data files / 100 TB):
 *  - data reads go through Spark's vectorized Parquet reader with
 *    whole-stage codegen; this class only plans which files to read;
 *  - file pruning is driver-side over in-memory `DataFileMeta` (a few
 *    hundred bytes per file — 10^5 files ≈ tens of MB);
 *  - footer stats collection is distributed (see [[StatsCollector]]).
 */
class GraftTable private (val root: String, val spark: SparkSession) {

  private def metadataDir = s"$root/metadata"
  private def hintPath = s"$metadataDir/version-hint.text"
  def dataDir = s"$root/data"
  def metricsDir = s"$root/metrics"

  // ---- metadata access -----------------------------------------------------

  /** Latest committed version number (source of truth: max vN.json present).
    * ONE directory listing — the previous hint-then-probe loop cost
    * O(commits since hint) existence checks per metadata read, a latency
    * amplifier on an object store where each probe is a round trip. */
  def currentVersion: Int = {
    val versions = FileIO.listFiles(metadataDir, ".json").flatMap { p =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      if (name.startsWith("v")) name.stripPrefix("v").stripSuffix(".json").toIntOption
      else None
    }
    if (versions.isEmpty) 1 else versions.max
  }

  def metadata: TableMetadata = metadataAt(currentVersion)

  def metadataAt(version: Int): TableMetadata =
    MetaJson.readTableMetadata(FileIO.readString(s"$metadataDir/v$version.json"))

  def schema: StructType = schemaOf(metadata)

  @volatile private var fieldIdConfSet = false

  private def schemaOf(md: TableMetadata): StructType = {
    val s = md.schemaJson
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(StructType.fromDDL(md.schemaDdl))
    // field-id column resolution (see [[GraftTable.withFieldIds]]): when a
    // requested schema carries parquet field ids, the vectorized reader
    // looks columns up BY ID — what keeps files written before a RENAME
    // readable (their physical name differs). Flipped only once a session
    // actually resolves an id-ful graft schema (every read/merge/stream
    // path passes through here first), so sessions that never touch such
    // a table keep Spark's default by-name resolution everywhere.
    if (!fieldIdConfSet && GraftTable.hasFieldIds(s)) {
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      fieldIdConfSet = true
    }
    s
  }

  /** Hidden-partitioning transforms, if the table declares any (see
    * [[PartitionSpec]]); validated against the schema. */
  def partitionSpecs: Seq[PartitionSpec] = {
    val md = metadata
    specsOf(md, schemaOf(md))
  }

  private def specsOf(md: TableMetadata, sch: StructType): Seq[PartitionSpec] =
    md.properties.get(PartitionSpec.Property).map(PartitionSpec.parseMulti)
      .getOrElse(Seq.empty)
      .map { sp => sp.validate(sch); sp }

  /** First (or only) hidden-partitioning transform. */
  def partitionSpec: Option[PartitionSpec] = partitionSpecs.headOption

  /** ACTIVE transforms plus every HISTORICAL generation's (spec evolution):
    * each data file's path physically encodes the spec generation it was
    * written under (`gp_bucket_8_url=…` vs `gp_bucket_16_url=…` are
    * distinct dir names), so pruning and maintenance grouping evaluate the
    * union and each file answers only for its own generation. Historical
    * specs whose source column was since renamed/dropped no longer
    * validate and are silently skipped (their pruning is dead, which is
    * sound — the files just stop partition-pruning by that transform). */
  def allPartitionSpecs: Seq[PartitionSpec] = {
    val md = metadata
    allSpecsOf(md, schemaOf(md))
  }

  private def allSpecsOf(md: TableMetadata, sch: StructType): Seq[PartitionSpec] = {
    val active = specsOf(md, sch)
    val historical = PartitionSpec.parseHistory(md.properties.get(PartitionSpec.HistoryProperty))
      .flatMap { gen =>
        scala.util.Try {
          PartitionSpec.parseMulti(gen).map { sp => sp.validate(sch); sp }
        }.getOrElse(Seq.empty)
      }
    val activeNames = active.map(_.name).toSet
    active ++ historical.filterNot(sp => activeNames.contains(sp.name))
      .groupBy(_.name).map(_._2.head)
  }

  /**
   * Partition-spec evolution: replace the ACTIVE transform set (None =
   * unpartition). New files are written under the new spec; existing files
   * keep their directory layout, and the outgoing spec joins the history
   * property so their pruning keeps working (see [[allPartitionSpecs]]).
   * Maintenance groups by each file's own generation, so compaction or
   * clustering never mixes generations into one rewrite group — changing
   * `bucket(8)` to `bucket(16)` migrates the layout incrementally as data
   * is rewritten, not in one big bang.
   */
  def setPartitionSpec(spec: Option[String]): TableMetadata = commitMetadataUpdate { md =>
    val sch = schemaOf(md)
    spec.foreach(s => PartitionSpec.parseMulti(s).foreach(_.validate(sch)))
    val oldActive = md.properties.get(PartitionSpec.Property)
    if (oldActive == spec) md
    else {
      val hist = PartitionSpec.parseHistory(md.properties.get(PartitionSpec.HistoryProperty))
      val newHist = PartitionSpec.serializeHistory((hist ++ oldActive.toSeq).distinct)
      val props = (spec match {
        case Some(s) => md.properties + (PartitionSpec.Property -> s)
        case None    => md.properties - PartitionSpec.Property
      }) ++ (if (newHist.nonEmpty) Map(PartitionSpec.HistoryProperty -> newHist) else Map.empty)
      md.copy(properties = props)
    }
  }

  def currentSnapshot: Option[Snapshot] = metadata.currentSnapshot

  /** All data files of a snapshot (current if unspecified). */
  def files(snapshotId: Option[Long] = None): Seq[DataFileMeta] =
    filesOf(metadata, snapshotId)

  private def filesOf(md: TableMetadata, snapshotId: Option[Long]): Seq[DataFileMeta] = {
    val snap = snapshotId match {
      case Some(id) => md.snapshot(id).getOrElse(
        throw new IllegalArgumentException(s"unknown snapshot $id"))
      case None => md.currentSnapshot.getOrElse(return Seq.empty)
    }
    stripUntrustedDecimalBounds(md, snap.manifests.flatMap(m => readManifest(m.path)))
  }

  /** Decimal bound strings changed space once (parquet stats are UNSCALED;
    * early manifests stored them verbatim, current ones store the SCALED
    * decimal). Tables created since carry [[GraftTable.DecimalStatsScaledProp]];
    * for a table WITHOUT it, decimal bounds are ignored at planning time —
    * no pruning is always sound, comparing mixed spaces is not. A full
    * cluster rewrite re-collects stats; users can then set the property. */
  private def stripUntrustedDecimalBounds(
      md: TableMetadata, files: Seq[DataFileMeta]): Seq[DataFileMeta] = {
    if (md.properties.get(GraftTable.DecimalStatsScaledProp).contains("true")) return files
    val decCols = schemaOf(md).fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
    }.toSet
    if (decCols.isEmpty) files
    else files.map(f => f.copy(
      minValues = f.minValues -- decCols, maxValues = f.maxValues -- decCols))
  }

  def readManifest(relPath: String): Seq[DataFileMeta] =
    FileIO.readString(s"$root/$relPath").linesIterator
      .filter(_.nonEmpty).map(MetaJson.readDataFileMeta).toVector

  /** Write a manifest for `metas`; returns its ManifestMeta. */
  def writeManifest(metas: Seq[DataFileMeta]): ManifestMeta = {
    val rel = s"metadata/manifest-${UUID.randomUUID}.json"
    FileIO.writeString(s"$root/$rel", metas.map(MetaJson.write).mkString("\n"))
    ManifestMeta(rel, metas.size, metas.map(_.rows).sum, metas.map(_.bytes).sum)
  }

  // ---- scan planning -------------------------------------------------------

  /** Files that may contain rows matching `predicate` — min/max pruning. */
  def planFiles(predicate: Option[Column], snapshotId: Option[Long] = None): Seq[DataFileMeta] =
    planFilesOf(metadata, predicate, snapshotId)

  private def planFilesOf(md: TableMetadata, predicate: Option[Column],
      snapshotId: Option[Long]): Seq[DataFileMeta] = {
    val all = filesOf(md, snapshotId)
    predicate match {
      case Some(p) =>
        val sch = schemaOf(md)
        PredicatePrune.prune(sch, all, p, allSpecsOf(md, sch))
      case None => all
    }
  }

  /**
   * Snapshot-isolated read via a [[org.apache.spark.sql.graftshim.GraftFileIndex]]-backed
   * relation: Catalyst pushes the query's own data filters into `listFiles`,
   * so min/max file skipping happens for ANY predicate later applied to the
   * returned DataFrame (including through SQL views) — not only the optional
   * `predicate` argument, which is kept as an eager pre-prune plus residual
   * filter for callers that want plan-time file counts. Row-group pruning and
   * residual filtering remain Catalyst + Parquet pushdown.
   */
  def read(predicate: Option[Column] = None, snapshotId: Option[Long] = None): DataFrame = {
    // ONE metadata read per scan: every helper below derives from this md —
    // the getter-per-helper pattern cost ~7 full metadata parses per read(),
    // a latency amplifier on an object store (see class scaladoc)
    val md = metadata
    val sch = schemaOf(md)
    val planned = planFilesOf(md, predicate, snapshotId)
    val df = applyTombstonesOf(md,
      scanWithPosDeletesOf(md, sch, planned, allSpecsOf(md, sch), snapshotId),
      snapshotId)
    predicate match {
      case Some(p) => df.filter(p)
      case None    => df
    }
  }

  def readSnapshot(snapshotId: Long): DataFrame = read(None, Some(snapshotId))

  /** Latest snapshot committed at or before `tsMs` (time travel by wall
    * clock — pair with [[readSnapshot]]). Resolved against the CURRENT
    * snapshot's ancestor chain only: branches abandoned by [[rollback]]
    * stay readable by id but must not win as-of resolution (their commit
    * timestamps are later than the rollback target's, so a whole-log scan
    * would time-travel onto the abandoned branch). */
  def snapshotAsOf(tsMs: Long): Option[Snapshot] = {
    val md = metadata
    val chain = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
    var cur = md.currentSnapshot
    while (cur.nonEmpty) {
      chain += cur.get
      cur = cur.get.parentId.flatMap(md.snapshot)
    }
    chain.filter(_.timestampMs <= tsMs).sortBy(s => (s.timestampMs, s.id)).lastOption
  }

  def readAsOf(tsMs: Long): DataFrame = {
    val snap = snapshotAsOf(tsMs).getOrElse(
      throw new IllegalArgumentException(s"no snapshot committed at or before $tsMs"))
    readSnapshot(snap.id)
  }

  // ---- metadata tables (Iceberg-style observability) ------------------------

  /** The snapshot log as a DataFrame (id, parent, ts, op, manifest/file/row/
    * byte counts + summary) — `SELECT`-able table history. */
  def snapshotsDf: DataFrame = {
    import spark.implicits._
    metadata.snapshots.map { s =>
      (s.id, s.parentId, new java.sql.Timestamp(s.timestampMs), s.operation,
        s.manifests.size, s.manifests.map(_.fileCount.toLong).sum,
        s.manifests.map(_.rows).sum, s.manifests.map(_.bytes).sum,
        s.summary)
    }.toDF("snapshot_id", "parent_id", "committed_at", "operation",
      "manifests", "files", "rows", "bytes", "summary")
  }

  /** The current (or a pinned) snapshot's file inventory as a DataFrame —
    * per-file rows, bytes, and min/max bounds for planning introspection. */
  def filesDf(snapshotId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    files(snapshotId).map { f =>
      (f.path, f.rows, f.bytes, f.commitUuid, f.minValues, f.maxValues, f.nullCounts)
    }.toDF("path", "rows", "bytes", "commit_uuid", "min_values", "max_values", "null_counts")
  }

  /** The current (or a pinned) snapshot's live merge-on-read delete files
    * as a DataFrame (``graft.`/path`.deletes`` metadata table): equality
    * tombstone files and position-delete (DV) files, with per-file row/byte
    * counts — the observability a 100 TB operator needs to decide when
    * delete pressure warrants a compaction pass. */
  def deletesDf(snapshotId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    (tombstones(snapshotId).map(f => ("equality", f.path, f.rows, f.bytes, f.commitUuid)) ++
      positionDeletes(snapshotId).map(f => ("position", f.path, f.rows, f.bytes, f.commitUuid)))
      .toDF("kind", "path", "rows", "bytes", "commit_uuid")
  }

  /** Per-partition file aggregates (``graft.`/path`.partitions`` metadata
    * table): files, rows, bytes, and the min/max file size of every hidden
    * partition — the "which partition needs OPTIMIZE" view. Partition
    * values are parsed from the data-file dir names, so files from
    * DIFFERENT spec generations land in distinct rows (`gp_bucket_8_url=3`
    * vs `gp_bucket_16_url=3` are different partitions — each file answers
    * only for the generation it was written under); pre-spec files report
    * as `<unpartitioned>`. Driver-side fold over the in-memory file metas —
    * O(live files), like every planning op here (≈20 ms at 2,560 files,
    * measured in the soak). */
  def partitionsDf(snapshotId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    // ONE metadata load for both the spec set and the file list — two
    // loads could pair one version's files with another's specs across a
    // concurrent spec-evolution commit
    val md = metadata
    val specs = allSpecsOf(md, schemaOf(md))
    filesOf(md, snapshotId)
      .map { f =>
        val pvals = specs.flatMap(sp => sp.dirValue(f.path).map(v => s"${sp.name}=$v"))
        (if (pvals.isEmpty) "<unpartitioned>" else pvals.mkString("/"), f)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, g) =>
        val fs = g.map(_._2)
        (p, fs.size.toLong, fs.map(_.rows).sum, fs.map(_.bytes).sum,
          fs.map(_.bytes).min, fs.map(_.bytes).max)
      }
      .toDF("partition", "files", "rows", "bytes", "min_file_bytes", "max_file_bytes")
  }

  /** Typed read: the snapshot-isolated scan as a `Dataset[T]` (per the
    * engine contract: typed Dataset/DataFrame APIs end-to-end, no RDDs). */
  def readAs[T: org.apache.spark.sql.Encoder](
      predicate: Option[Column] = None,
      snapshotId: Option[Long] = None): org.apache.spark.sql.Dataset[T] =
    read(predicate, snapshotId).as[T]

  // ---- merge-on-read equality deletes (tombstones) ---------------------------

  /** Tombstone (equality-delete) file metas of a snapshot. */
  def tombstones(snapshotId: Option[Long] = None): Seq[DataFileMeta] =
    tombstonesOf(metadata, snapshotId)

  private def tombstonesOf(md: TableMetadata, snapshotId: Option[Long]): Seq[DataFileMeta] = {
    val snap = snapshotId match {
      case Some(id) => md.snapshot(id).getOrElse(
        throw new IllegalArgumentException(s"unknown snapshot $id"))
      case None => md.currentSnapshot.getOrElse(return Seq.empty)
    }
    snap.deleteManifestList.flatMap(m => readManifest(m.path))
  }

  /** Tombstone sets above this row count anti-join via shuffle instead of
    * broadcast (a 10^8-key MoR delete must not OOM the driver). */
  val TombstoneBroadcastRowCap = 4L * 1000 * 1000

  /** Anti-join `df` against the snapshot's tombstone key tuples (joined on
    * ALL tombstone columns). Broadcast while the set is small (the intended
    * MoR niche); beyond [[TombstoneBroadcastRowCap]] rows it falls back to a
    * shuffled anti-join rather than an OOM. No-op when no tombstones exist. */
  def applyTombstones(df: DataFrame, snapshotId: Option[Long] = None): DataFrame =
    applyTombstonesOf(metadata, df, snapshotId)

  private def applyTombstonesOf(md: TableMetadata, df: DataFrame,
      snapshotId: Option[Long]): DataFrame = {
    val dels = tombstonesOf(md, snapshotId)
    if (dels.isEmpty) df
    else {
      val delDf = spark.read.parquet(dels.map(absPath): _*).distinct()
      val keys = delDf.columns.toSeq
      val rows = dels.map(_.rows).sum // exact, from manifest metadata — free
      val right =
        if (rows <= TombstoneBroadcastRowCap) org.apache.spark.sql.functions.broadcast(delDf)
        else delDf
      df.join(right, keys, "left_anti")
    }
  }

  /**
   * Merge-on-read equality delete: record the keys as a tombstone file and
   * commit WITHOUT rewriting any data file — at 100 TB you do not rewrite a
   * 1 GB file to delete three rows. Every read path anti-joins the
   * tombstones; compaction applies them to the files it rewrites; the
   * full-table cluster rewrite materializes and clears them.
   *
   * Semantics (equality delete, no sequence numbers): a tombstoned key is
   * suppressed in ALL data — including rows appended later — until the
   * tombstones are materialized away. MERGE refuses to run while tombstones
   * are live for this reason.
   *
   * `keys` columns name the (possibly composite) key — every column must
   * exist in the table schema, and all live tombstones of a table must use
   * the SAME column set (applyTombstones anti-joins on one column list).
   */
  def deleteByKeysMoR(keys: DataFrame, summary: Map[String, String] = Map.empty): Snapshot = {
    require(keys.columns.nonEmpty, "tombstone frame needs at least one key column")
    val keyCols = keys.columns.toSeq
    keyCols.foreach(k => require(schema.fieldNames.contains(k), s"unknown key column $k"))
    val uuid = UUID.randomUUID.toString
    val dir = s"$dataDir/$uuid"
    keys.distinct().write.mode("errorifexists").parquet(dir)
    val written = FileIO.listFiles(dir, ".parquet")
    val metas = StatsCollector.collect(
      spark, StructType(keyCols.map(k => schema(schema.fieldIndex(k)))), root, written, uuid)
    commitFull("delete-mor") { parent =>
      // same-key check INSIDE the commit loop: it re-evaluates against the
      // actual parent on every retry, so two racing deletes on different
      // columns cannot both land (check-then-act outside the loop would let
      // applyTombstones silently drop one set — it anti-joins on one list)
      for (existing <- parent.toSeq.flatMap(_.deleteManifestList)
             .flatMap(m => readManifest(m.path)).headOption) {
        val existingKeys = spark.read.parquet(absPath(existing)).columns.toSeq
        require(existingKeys == keyCols,
          s"table already has tombstones on '${existingKeys.mkString(",")}'; materialize them " +
            s"(cluster rewrite) before deleting on '${keyCols.mkString(",")}'")
      }
      (parent.map(_.manifests).getOrElse(Seq.empty),
        Some(parent.map(_.deleteManifestList).getOrElse(Seq.empty) :+ writeManifest(metas)),
        parent.flatMap(_.posDeleteManifests),
        summary ++ Map("delete-key" -> keyCols.mkString(","),
          "tombstones-added" -> metas.map(_.rows).sum.toString))
    }
  }

  // ---- merge-on-read position deletes (deletion vectors) ---------------------

  /** Schema of a position-delete (deletion-vector) file: `_file` is a data
    * file's table-relative path (= [[DataFileMeta.path]]), `_pos` a 0-based
    * deleted row position within it (parquet `_metadata.row_index`). */
  val PosDeleteSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("_file",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("_pos",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** Position-delete (deletion-vector) file metas of a snapshot. */
  def positionDeletes(snapshotId: Option[Long] = None): Seq[DataFileMeta] =
    posDeletesOf(metadata, snapshotId)

  private def posDeletesOf(md: TableMetadata, snapshotId: Option[Long]): Seq[DataFileMeta] = {
    val snap = snapshotId match {
      case Some(id) => md.snapshot(id).getOrElse(
        throw new IllegalArgumentException(s"unknown snapshot $id"))
      case None => md.currentSnapshot.getOrElse(return Seq.empty)
    }
    snap.posDeleteList.flatMap(m => readManifest(m.path))
  }

  /** Table-relative path of the file a scanned row came from, derived from
    * `_metadata.file_path`: `data/` plus everything after the LAST `/data/`
    * — the table's data dir. Sound regardless of how the filesystem spells
    * the root (file:/ vs file:///) and of hidden-partition dirs (those are
    * `name=value` segments and can never equal `data`); matches
    * [[DataFileMeta.path]] by construction of the write layout. */
  private def relPathExpr: Column = {
    import org.apache.spark.sql.functions.{col, concat, lit, substring_index}
    // substring_index(…, -1) = everything after the LAST occurrence — same
    // value as element_at(split(…), -1) without the per-row array allocation
    // (this expression runs once per scanned row on every DV-covered read)
    concat(lit("data/"), substring_index(col("_metadata.file_path"), "/data/", -1))
  }

  /** Could any row of DV file `d` reference data file `path`? min/max
    * prune on `_file` (missing bounds → conservatively yes). */
  private def dvMayCover(d: DataFileMeta, path: String): Boolean =
    d.minValues.get("_file").forall(_ <= path) &&
      d.maxValues.get("_file").forall(path <= _)

  /** Anti-join `df` — a parquet file-source scan over exactly `filesRead` —
    * against the snapshot's position deletes that may reference those files
    * (no-op when none can: the DV `_file` bounds vs the read file paths).
    * Broadcasts the DV rows below [[TombstoneBroadcastRowCap]]. Every
    * rewrite pass MUST read its input files through this (then commit via
    * [[replaceFiles]], which drops exactly the rewritten files' DV rows). */
  def withPositionDeletes(df: DataFrame, filesRead: Seq[DataFileMeta],
      snapshotId: Option[Long] = None): DataFrame =
    withPositionDeletesOf(metadata, df, filesRead, snapshotId)

  private def withPositionDeletesOf(md: TableMetadata, df: DataFrame,
      filesRead: Seq[DataFileMeta], snapshotId: Option[Long]): DataFrame = {
    val dvs = posDeletesOf(md, snapshotId)
    if (dvs.isEmpty || !filesRead.exists(f => dvs.exists(d => dvMayCover(d, f.path)))) df
    else antiJoinPosDeletes(df, dvs)
  }

  /** `df` with its (file, row-position) columns materialized as
    * `_gdv_rel`/`_gdv_idx` — must sit directly above a file-source scan
    * (where `_metadata` resolves). */
  private def withPosCols(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("_gdv_rel", relPathExpr)
      .withColumn("_gdv_idx", col("_metadata.row_index"))
  }

  private def antiJoinPosDeletes(df: DataFrame, dvs: Seq[DataFileMeta],
      keepPosCols: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val dvDf = spark.read.schema(PosDeleteSchema).parquet(dvs.map(absPath): _*)
      .withColumnRenamed("_file", "_gdv_file").withColumnRenamed("_pos", "_gdv_pos")
      .distinct()
    val right = if (dvs.map(_.rows).sum <= TombstoneBroadcastRowCap) broadcast(dvDf) else dvDf
    val joined = withPosCols(df)
      .join(right, col("_gdv_rel") === col("_gdv_file") &&
        col("_gdv_idx") === col("_gdv_pos"), "left_anti")
    if (keepPosCols) joined else joined.drop("_gdv_rel", "_gdv_idx")
  }

  /** Like [[withPositionDeletes]] but ALWAYS materializes the scanned rows'
    * (file, row-position) as `_gdv_rel`/`_gdv_idx` on the result — for
    * rewriters that need the surviving rows' positions (the MoR merge
    * records changed target rows as deletion-vector entries). `df` must sit
    * directly above a file-source scan. */
  def withPositionDeletesKeepingPos(df: DataFrame, filesRead: Seq[DataFileMeta],
      snapshotId: Option[Long] = None): DataFrame = {
    val dvs = posDeletesOf(metadata, snapshotId)
    if (dvs.isEmpty || !filesRead.exists(f => dvs.exists(d => dvMayCover(d, f.path))))
      withPosCols(df)
    else antiJoinPosDeletes(df, dvs, keepPosCols = true)
  }

  /** Snapshot scan with position deletes applied via a SPLIT plan: files no
    * DV can reference scan untouched (at 100 TB the dominant branch — DVs
    * cover the trickle-deleted tail); possibly-covered files scan with
    * (file, row-position) metadata and anti-join the DV rows. Catalyst
    * pushes the query's filters into both branches' file indexes. */
  private def scanWithPosDeletesOf(md: TableMetadata, sch: StructType,
      planned: Seq[DataFileMeta], specs: Seq[PartitionSpec],
      snapshotId: Option[Long]): DataFrame = {
    // bucket-aware scan: when every planned file is provably bucket-pure and
    // stamped, the relation reports HashPartitioning(col, n) — attached on
    // the plain branch only (the DV anti-join branch reads `_metadata`
    // columns and is union-destined, where the partitioning can't help)
    val bs = bucketSpecOf(md, sch, planned)
    def rel(fs: Seq[DataFileMeta], bucketed: Option[org.apache.spark.sql.catalyst.catalog.BucketSpec]) =
      org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
        spark, sch, root, fs, specs, bucketSpec = bucketed)
    val dvs = posDeletesOf(md, snapshotId)
    if (dvs.isEmpty) return rel(planned, bs)
    val (covered, plain) = planned.partition(f => dvs.exists(d => dvMayCover(d, f.path)))
    if (covered.isEmpty) rel(planned, bs)
    else {
      val deleted = antiJoinPosDeletes(rel(covered, None), dvs)
      if (plain.isEmpty) deleted else rel(plain, None).unionByName(deleted)
    }
  }

  /** The `BucketSpec` a scan over exactly `files` may report, or None. Sound
    * only when the ACTIVE spec carries exactly one bucket transform and EVERY
    * file is bucket-stamped ([[stampBucketIds]]) consistently with its
    * partition dir: Spark's bucketed read throws on an unstamped file name
    * and would silently mis-group rows on a wrong stamp, so this is
    * all-or-nothing by design. Files from an older spec generation (different
    * dir name) or written before the spec fail the check and the scan simply
    * stays unbucketed — a full rewrite (cluster/compact) migrates them.
    * O(planned files) driver-side string parsing, like all planning here. */
  /** Public form of [[bucketSpecOf]] over a whole snapshot's files — for
    * front-door relations built outside [[read]] (the DSv1 provider). */
  def bucketSpec(snapshotId: Option[Long] = None): Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] = {
    val md = metadata
    bucketSpecOf(md, schemaOf(md), filesOf(md, snapshotId))
  }

  /** [[bucketSpecOf]] over an explicit file subset — for operators that scan
    * a planned slice of the table (MERGE's touched files): sound because a
    * bucket-pure file stays bucket-pure in any subset. */
  def bucketSpecFor(files: Seq[DataFileMeta]): Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] = {
    val md = metadata
    bucketSpecOf(md, schemaOf(md), files)
  }

  private def bucketSpecOf(md: TableMetadata, sch: StructType,
      files: Seq[DataFileMeta]): Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] = {
    val sp = activeBucketSpec(md, sch).getOrElse(return None)
    if (files.nonEmpty && files.forall(f => bucketFileConforms(sp, f)))
      Some(org.apache.spark.sql.catalyst.catalog.BucketSpec(
        sp.param.get, Seq(sp.sourceColumn), Nil))
    else None
  }

  /** The ACTIVE bucket transform, when the active spec carries exactly one
    * (the only shape the bucketed-scan gate and [[graft.ops.Rebucket]]
    * understand). */
  private def activeBucketSpec(md: TableMetadata, sch: StructType): Option[PartitionSpec] = {
    val bs = specsOf(md, sch).filter(_.transform == "bucket")
    if (bs.size == 1) Some(bs.head) else None
  }

  /** A data file conforms to the active bucket spec iff its path carries the
    * spec's partition dir with an integral value AND its file name is
    * bucket-stamped to the same id ([[stampBucketIds]]) — the exact per-file
    * test the all-or-nothing scan gate ([[bucketSpec]]) applies. */
  private def bucketFileConforms(sp: PartitionSpec, f: DataFileMeta): Boolean = {
    val dir = sp.dirValue(f.path).flatMap(v => scala.util.Try(v.toInt).toOption)
    dir.isDefined && org.apache.spark.sql.graftshim.GraftRelation
      .bucketIdOf(f.path.substring(f.path.lastIndexOf('/') + 1)) == dir
  }

  /** Files of the current snapshot that do NOT conform to the active bucket
    * spec — an older spec generation's dir layout, pre-spec (no dirs), or
    * unstamped names. Any one of them keeps the bucketed-scan gate off for
    * every scan that selects it; [[graft.ops.Rebucket.migrate]] rewrites
    * exactly this set. Empty when the active spec carries no (single) bucket
    * transform — there is nothing to conform to. */
  def nonconformingFiles(): Seq[DataFileMeta] = {
    val md = metadata
    activeBucketSpec(md, schemaOf(md)) match {
      case Some(sp) => filesOf(md, None).filterNot(f => bucketFileConforms(sp, f))
      case None     => Seq.empty
    }
  }

  /**
   * Merge-on-read POSITION delete (deletion vector): record the row
   * positions matching `predicate` in a (file, pos) delete file and commit
   * WITHOUT rewriting any data file — at 100 TB a trickle delete must not
   * rewrite 1 GB files for a few rows each (the same niche as
   * [[deleteByKeysMoR]], re-imagining the reference's incremental delete
   * delivery, `adapter/HBaseSourceTableAdapter.java:592-604`).
   *
   * Unlike equality tombstones, position deletes are FILE-SCOPED: any
   * predicate is allowed (not just keys), rows appended LATER are
   * unaffected, MERGE keeps running, and a rewrite clears exactly the
   * rewritten files' delete rows — they compose with every maintenance op
   * instead of blocking it. Cost: one metadata-pruned scan of the candidate
   * files to record positions. Returns None when no row matches.
   */
  def deleteWherePositional(predicate: Column,
      summary: Map[String, String] = Map.empty): Option[Snapshot] = {
    import org.apache.spark.sql.functions.col
    val md = metadata
    val sch = schemaOf(md)
    val planned = planFilesOf(md, Some(predicate), None)
    if (planned.isEmpty) return None
    val uuid = s"dv-${UUID.randomUUID}"
    val dir = s"$dataDir/$uuid"
    val raw = org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
      spark, sch, root, planned, allSpecsOf(md, sch))
    // positions are computed on the LIVE view (existing DVs and equality
    // tombstones applied), so re-running the same delete is a no-op commit
    // and "rows deleted" counts are logical, as in Delta/Iceberg
    val dvs = posDeletesOf(md, None)
    val live = applyTombstonesOf(md,
      if (dvs.isEmpty) withPosCols(raw)
      else antiJoinPosDeletes(raw, dvs, keepPosCols = true),
      None)
    live.filter(predicate)
      .select(col("_gdv_rel").as("_file"), col("_gdv_idx").as("_pos"))
      .sortWithinPartitions("_file", "_pos") // tight per-DV-file _file bounds
      .write.mode("errorifexists").parquet(dir)
    val metas = StatsCollector.collect(
      spark, PosDeleteSchema, root, FileIO.listFiles(dir, ".parquet"), uuid)
      .filter(_.rows > 0)
    if (metas.isEmpty) { FileIO.deleteRecursively(dir); return None }
    // the files the positions actually reference (bounded by touched files):
    // validated against the commit parent so a concurrent REWRITE of one
    // (positions now meaningless) forces a replan, while appends / other
    // deletes race through — file immutability keeps their positions valid
    val referenced = spark.read.schema(PosDeleteSchema).parquet(dir)
      .select("_file").distinct().collect().map(_.getString(0))
    Some(commitFull("delete-pos") { parent =>
      val live = parent.toSeq.flatMap(_.manifests).flatMap(m => readManifest(m.path))
        .map(_.path).toSet
      val gone = referenced.filterNot(live)
      require(gone.isEmpty,
        s"delete-pos planned against files a concurrent commit rewrote " +
          s"(${gone.take(3).mkString(", ")}${if (gone.length > 3) ", …" else ""}); replan required")
      (parent.map(_.manifests).getOrElse(Seq.empty),
        parent.flatMap(_.deleteManifests),
        Some(parent.map(_.posDeleteList).getOrElse(Seq.empty) :+ writeManifest(metas)),
        summary ++ Map("predicate" -> predicate.toString,
          "position-deletes-added" -> metas.map(_.rows).sum.toString,
          "position-delete-files" -> referenced.length.toString))
    })
  }

  /**
   * Merge-on-read UPDATE (Delta-DV-style): ONE commit that position-deletes
   * the matching rows and appends their updated images — no data file is
   * rewritten, so a trickle update on a 100 TB table costs the matching
   * rows, not the touched files. Assignments evaluate against the
   * PRE-update row (ANSI semantics), cast to the column type; CHECK
   * constraints run inline on the appended images (writeDataFiles).
   * Returns None when no row matches.
   */
  def updateWherePositional(predicate: Column, set: Map[String, Column],
      summary: Map[String, String] = Map.empty): Option[Snapshot] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    val md = metadata
    val sch = schemaOf(md)
    for (c <- set.keys)
      require(sch.fieldNames.contains(c), s"UPDATE of unknown column $c")
    val planned = planFilesOf(md, Some(predicate), None)
    if (planned.isEmpty) return None
    val raw = org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
      spark, sch, root, planned, allSpecsOf(md, sch))
    val dvs = posDeletesOf(md, None)
    val live = applyTombstonesOf(md,
      if (dvs.isEmpty) withPosCols(raw)
      else antiJoinPosDeletes(raw, dvs, keepPosCols = true),
      None)
    val hit = live.filter(coalesce(predicate, lit(false)))
    // ONE scan feeds both outputs: persist the matching rows (the MoR
    // niche is a trickle — small), then project positions and new images
    hit.persist()
    try {
      val uuid = s"dvu-${UUID.randomUUID}"
      val dvDir = s"$dataDir/$uuid"
      hit.select(col("_gdv_rel").as("_file"), col("_gdv_idx").as("_pos"))
        .sortWithinPartitions("_file", "_pos")
        .write.mode("errorifexists").parquet(dvDir)
      val dvMetas = StatsCollector.collect(
        spark, PosDeleteSchema, root, FileIO.listFiles(dvDir, ".parquet"), uuid)
        .filter(_.rows > 0)
      if (dvMetas.isEmpty) { FileIO.deleteRecursively(dvDir); return None }
      val referenced = spark.read.schema(PosDeleteSchema).parquet(dvDir)
        .select("_file").distinct().collect().map(_.getString(0))
      val images = hit.select(sch.fields.toSeq.map { f =>
        set.get(f.name) match {
          case Some(v) => when(coalesce(predicate, lit(false)), v.cast(f.dataType))
            .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
      val added = writeDataFiles(images, s"update-$uuid")
      Some(commitFull("update-pos") { parent =>
        val livePaths = parent.toSeq.flatMap(_.manifests).flatMap(m => readManifest(m.path))
          .map(_.path).toSet
        val gone = referenced.filterNot(livePaths)
        require(gone.isEmpty,
          s"update-pos planned against files a concurrent commit rewrote " +
            s"(${gone.take(3).mkString(", ")}${if (gone.length > 3) ", …" else ""}); replan required")
        (parent.map(_.manifests).getOrElse(Seq.empty) :+ writeManifest(added),
          parent.flatMap(_.deleteManifests),
          Some(parent.map(_.posDeleteList).getOrElse(Seq.empty) :+ writeManifest(dvMetas)),
          summary ++ Map("predicate" -> predicate.toString,
            "set-columns" -> set.keys.toSeq.sorted.mkString(","),
            "position-deletes-added" -> dvMetas.map(_.rows).sum.toString,
            "updated-rows" -> added.map(_.rows).sum.toString))
      })
    } finally hit.unpersist()
  }

  /** Rows of `files` whose (file, row-position) appears in the given
    * position-delete entries — the row images a delete-pos commit removed
    * (the changelog/CDC scan). Touches only the files the DV rows can
    * reference (bounds prune on `_file`); semi-join broadcast below
    * [[TombstoneBroadcastRowCap]]. */
  def rowsAtPositions(sch: StructType, files: Seq[DataFileMeta],
      dvEntries: Seq[DataFileMeta]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val covered = files.filter(f => dvEntries.exists(d => dvMayCover(d, f.path)))
    val scan = org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
      spark, sch, root, covered, allPartitionSpecs)
    val dvDf = spark.read.schema(PosDeleteSchema).parquet(dvEntries.map(absPath): _*)
      .withColumnRenamed("_file", "_gdv_file").withColumnRenamed("_pos", "_gdv_pos")
      .distinct()
    val right = if (dvEntries.map(_.rows).sum <= TombstoneBroadcastRowCap) broadcast(dvDf) else dvDf
    withPosCols(scan)
      .join(right, col("_gdv_rel") === col("_gdv_file") &&
        col("_gdv_idx") === col("_gdv_pos"), "left_semi")
      .drop("_gdv_rel", "_gdv_idx")
  }

  /** Deleted-row count per data-file path across a snapshot's DV files
    * (duplicates across DV files count once) — one tiny aggregate over the
    * DV rows; drives compaction's delete-pressure eligibility. Driver-side
    * result is bounded by the number of COVERED files, not DV rows. */
  def posDeleteRowCounts(snapshotId: Option[Long] = None): Map[String, Long] = {
    val dvs = positionDeletes(snapshotId)
    if (dvs.isEmpty) Map.empty
    else spark.read.schema(PosDeleteSchema).parquet(dvs.map(absPath): _*)
      .distinct()
      .groupBy("_file").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /**
   * Compact the live position-delete (DV) files — the niche of Iceberg's
   * `rewrite_position_delete_files` — WITHOUT touching any data file.
   * Every MoR delete/update/merge commit adds its own small DV file, and a
   * covered read anti-joins their UNION, so between delete-pressure
   * compactions the DV file count (and duplicate `(_file,_pos)` entries
   * from overlapping deletes) grows with the commit rate. One pass reads
   * the live DV rows, dedupes, and rewrites them globally sorted by
   * `(_file, _pos)` into ~`targetBytes` files — so each output DV file
   * carries a TIGHT contiguous `_file` bounds window and [[dvMayCover]]
   * prunes whole DV files per scanned data file. Entries can never
   * reference dead data files ([[rewritePosDeletes]] clears them exactly
   * at each data-file rewrite), and a concurrent DV change between plan
   * and commit aborts loudly (the covered manifests must all still be
   * live). Commits as row-preserving `rewrite-deletes`: invisible to
   * changelog and incremental readers, like compact/cluster. Returns None
   * below 2 live DV files.
   */
  def rewriteDeleteFiles(targetBytes: Long = 8L << 20,
      summary: Map[String, String] = Map.empty): Option[Snapshot] = {
    val md = metadata
    val dvs = posDeletesOf(md, None)
    if (dvs.size < 2) return None
    val covered = md.currentSnapshot.toSeq.flatMap(_.posDeleteList).map(_.path).toSet
    val uuid = s"dvc-${UUID.randomUUID}"
    val dir = s"$dataDir/$uuid"
    val nOut = math.max(1L, dvs.map(_.bytes).sum / targetBytes)
    val perFile = math.max(1L, dvs.map(_.rows).sum / nOut) // pre-dedup upper bound
    // cleanup covers the WRITE failure window too (ENOSPC mid-write would
    // otherwise leak a partial staging dir no maintenance pass reclaims)
    try {
      spark.read.schema(PosDeleteSchema).parquet(dvs.map(absPath): _*)
        .distinct()
        .sort("_file", "_pos") // range exchange: contiguous per-file bounds
        .write.option("maxRecordsPerFile", perFile.toString)
        .mode("errorifexists").parquet(dir)
      val metas = StatsCollector.collect(
        spark, PosDeleteSchema, root, FileIO.listFiles(dir, ".parquet"), uuid)
        .filter(_.rows > 0)
      Some(commitFull("rewrite-deletes") { parent =>
        val parentList = parent.toSeq.flatMap(_.posDeleteList)
        require(covered.subsetOf(parentList.map(_.path).toSet),
          "rewrite-deletes planned against DV manifests a concurrent commit " +
            "replaced (a data-file rewrite cleared some of their rows); re-run")
        val kept = parentList.filterNot(m => covered.contains(m.path))
        (parent.map(_.manifests).getOrElse(Seq.empty),
          parent.flatMap(_.deleteManifests),
          Some(kept ++ (if (metas.isEmpty) Seq.empty else Seq(writeManifest(metas)))),
          summary ++ Map(
            "dv-files-in" -> dvs.size.toString,
            "dv-files-out" -> metas.size.toString,
            "dv-rows-out" -> metas.map(_.rows).sum.toString))
      })
    } catch { case e: Throwable => FileIO.deleteRecursively(dir); throw e }
  }

  /** Parent's position-delete manifests minus rows referencing
    * `removedPaths` (whose rewrite APPLIED those deletes — see
    * [[withPositionDeletes]]): DV files that cannot reference a removed
    * path are kept verbatim (bounds check, no read); intersecting ones are
    * rewritten without the dead rows and dropped entirely when empty —
    * EXACT per-file clearing, the property equality tombstones can't have.
    * Returns (new manifest list, DV rows cleared). */
  private def rewritePosDeletes(parent: Option[Snapshot],
      removedPaths: Set[String]): (Option[Seq[ManifestMeta]], Long) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val manifests = parent.map(_.posDeleteList).getOrElse(Seq.empty)
    if (manifests.isEmpty || removedPaths.isEmpty)
      return (parent.flatMap(_.posDeleteManifests), 0L)
    val (hitM, keptM) = manifests.partition(m =>
      readManifest(m.path).exists(d => removedPaths.exists(p => dvMayCover(d, p))))
    if (hitM.isEmpty) return (parent.flatMap(_.posDeleteManifests), 0L)
    val entries = hitM.flatMap(m => readManifest(m.path))
    val (hit, miss) = entries.partition(d => removedPaths.exists(p => dvMayCover(d, p)))
    val removedDf = {
      import spark.implicits._
      removedPaths.toSeq.toDF("_gdv_rm")
    }
    val uuid = s"dvrw-${UUID.randomUUID}"
    val dir = s"$dataDir/$uuid"
    spark.read.schema(PosDeleteSchema).parquet(hit.map(absPath): _*)
      .join(broadcast(removedDf), col("_file") === col("_gdv_rm"), "left_anti")
      .sortWithinPartitions("_file", "_pos")
      .write.mode("errorifexists").parquet(dir)
    val rewritten = StatsCollector.collect(
      spark, PosDeleteSchema, root, FileIO.listFiles(dir, ".parquet"), uuid)
      .filter(_.rows > 0)
    val cleared = hit.map(_.rows).sum - rewritten.map(_.rows).sum
    val survivors = miss ++ rewritten
    val out = if (survivors.isEmpty) keptM else keptM :+ writeManifest(survivors)
    (if (out.isEmpty) None else Some(out), cleared)
  }

  /**
   * Incremental (CDC-style) read: rows APPENDED after `fromSnapshotId`
   * (exclusive) up to `toSnapshotId` (inclusive; default current) — the
   * engine's answer to the reference's checkpoint-driven incremental load
   * (`util/TimeStampUtil.java:53-109` + the time-range scan at
   * `job/JobUtil.java:543-577`): instead of re-scanning a time window with a
   * 90-day late-data allowance, the snapshot chain names exactly the data
   * files each append committed, so the diff is precise and re-runnable.
   *
   * Row-preserving rewrites (compact / cluster / rewrite-manifests) are
   * transparent — they reshuffle existing rows into new files and are
   * skipped. Row-CHANGING snapshots in the range (merge / delete /
   * overwrite) cannot be expressed as a file-level append diff; those
   * throw, directing the caller to a full-table diff.
   */
  def incrementalRead(fromSnapshotId: Long, toSnapshotId: Option[Long] = None): DataFrame = {
    val (added, to) = incrementalFiles(fromSnapshotId, toSnapshotId)
    incrementalResult(added, to)
  }

  /**
   * The file-level diff behind [[incrementalRead]]: data files APPENDED in
   * `(fromSnapshotId, to]`, plus the resolved `to` id (so callers apply that
   * snapshot's tombstones). `skipChangeCommits = true` silently SKIPS
   * row-changing commits (merge / update / delete / overwrite /
   * tombstone-materializing rewrites) instead of throwing — the streaming
   * CDC source's opt-out, mirroring the append-only contract a tailing
   * consumer accepts: appends land, rewrites of already-delivered rows are
   * never re-delivered or retracted.
   */
  def incrementalFiles(
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None,
      skipChangeCommits: Boolean = false): (Seq[DataFileMeta], Long) = {
    val md = metadata
    // schema evolution commits reshape METADATA only (stats-key remap);
    // every row survives them, so incremental readers pass through —
    // ONE shared op set with the changelog (Changelog.RowPreservingOps)
    val rowPreserving = Changelog.RowPreservingOps
    val to = toSnapshotId.orElse(md.currentSnapshotId).getOrElse(
      throw new IllegalArgumentException("incremental read on an empty table"))
    require(md.snapshot(fromSnapshotId).nonEmpty || fromSnapshotId == 0,
      s"unknown or expired snapshot $fromSnapshotId")
    var cursor = md.snapshot(to).getOrElse(
      throw new IllegalArgumentException(s"unknown snapshot $to"))
    val added = scala.collection.mutable.ArrayBuffer.empty[DataFileMeta]
    while (cursor.id != fromSnapshotId) {
      cursor.operation match {
        // "publish" (branch cherry-pick) is append-SHAPED: manifests are
        // the parent's plus the staged additions, tombstones unchanged
        case "append" | "publish" =>
          val parentManifests = cursor.parentId
            .flatMap(md.snapshot).map(_.manifests.map(_.path).toSet)
            .getOrElse(Set.empty)
          for (m <- cursor.manifests if !parentManifests.contains(m.path))
            added ++= readManifest(m.path)
        case op if rowPreserving.contains(op) =>
          // a full cluster rewrite that MATERIALIZED live tombstones removed
          // rows (a key tombstoned before `from`, re-appended in-range, then
          // materialized away would otherwise be returned here while read()
          // at `to` hides it)
          if (cursor.summary.get("materialized-tombstones").contains("true") && !skipChangeCommits)
            throw new IllegalArgumentException(
              s"snapshot ${cursor.id} ('$op') materialized tombstones and is not " +
                "row-preserving; file-level incremental read is append-only — " +
                "diff full snapshots instead")
        case op =>
          if (!skipChangeCommits)
            throw new IllegalArgumentException(
              s"snapshot ${cursor.id} is a row-changing '$op' commit; " +
                "file-level incremental read is append-only — diff full snapshots " +
                "instead (streaming readers: option skip-change-commits=true)")
          // skipped: the change commit's file additions are not emitted
      }
      cursor = cursor.parentId.flatMap(md.snapshot).getOrElse {
        if (cursor.parentId.contains(fromSnapshotId) || (cursor.parentId.isEmpty && fromSnapshotId == 0))
          return (added.toSeq, to)
        throw new IllegalArgumentException(
          s"snapshot chain from $to to $fromSnapshotId broken " +
            "(expired snapshot, or a rollback onto another branch?)")
      }
    }
    (added.toSeq, to)
  }

  /**
   * Row-level CDC changelog of `(fromSnapshotId, to]`: per-commit INSERT and
   * DELETE row images ([[Changelog.ChangeTypeCol]] / [[Changelog.CommitCol]]
   * columns appended to the table schema) — the change-capture mode that
   * handles the row-CHANGING commits [[incrementalRead]] must refuse (merge /
   * update / delete / tombstone commits), at the cost of computing each such
   * commit's removed-vs-added row diff. Fold in commit order to materialize.
   * Streaming form: `readStream.format("graft").option("change-rows", true)`.
   *
   * `updateImagesOn`: pair each commit's delete+insert of the same key tuple
   * into `update_preimage`/`update_postimage` events (Delta-CDF-style; see
   * [[Changelog.withUpdateImages]]) — pass the table's MERGE key.
   */
  def changes(fromSnapshotId: Long, toSnapshotId: Option[Long] = None,
      updateImagesOn: Seq[String] = Seq.empty): DataFrame =
    Changelog.changes(this, fromSnapshotId, toSnapshotId,
      updateImagesOn = updateImagesOn)

  /** Incremental-read result with the `to` snapshot's tombstones applied —
    * the consumer must see exactly what `read()` at `to` would show for
    * these rows (a key tombstoned before `from` and re-appended inside the
    * range is hidden from full reads, so it must be hidden here too). */
  private def incrementalResult(added: Seq[DataFileMeta], to: Long): DataFrame = {
    val md = metadata
    val sch = schemaOf(md)
    applyTombstonesOf(md,
      withPositionDeletesOf(md,
        org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
          spark, sch, root, added, allSpecsOf(md, sch)),
        added, Some(to)),
      Some(to))
  }

  // ---- writes --------------------------------------------------------------

  /**
   * Write `df` as new data files under a fresh commit directory and collect
   * their footer stats. Does NOT commit — callers build the snapshot.
   * Partitioning/file count is the caller's responsibility (e.g.
   * `repartitionByRange` before calling).
   */
  def writeDataFiles(df: DataFrame, commitUuid: String = UUID.randomUUID.toString,
      maxRecordsPerFile: Long = 0L): Seq[DataFileMeta] = {
    val dir = s"$dataDir/$commitUuid"
    // INT96 (Spark's legacy parquet timestamp) carries no min/max stats;
    // micros are required for warc_ts pruning bounds. Set on the FRAME'S
    // session, not the table handle's: a streaming micro-batch executes
    // under MicroBatchExecution's cloned session, whose SQLConf snapshot
    // never sees a conf set on the original — sink-written files would
    // silently lose every timestamp bound
    df.sparkSession.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // select in schema order so files are column-identical across commits;
    // re-aliasing with the table field's METADATA stamps the stable parquet
    // field id onto every written column (fieldId.write.enabled is on by
    // default), which is what rename/drop evolution resolves by later
    val md = metadata // one read: schema + partition specs derive from it
    val sch = schemaOf(md)
    val cols = sch.fields.map { f =>
      // NESTED field ids live in the column's TYPE (StructField metadata
      // inside the struct), which comes from the incoming frame, not the
      // top-level alias — cast struct columns to the table's type so
      // fieldId.write stamps interior ids too. Only when the shapes agree
      // in order and names (then the positional cast is a pure metadata
      // reshape, and a no-op if the frame already carries the ids); any
      // other frame keeps today's behavior.
      val c = f.dataType match {
        case st: StructType if df.schema.fields
            .find(_.name.equalsIgnoreCase(f.name))
            .exists(d => GraftTable.sameShape(d.dataType, st) && d.dataType != st) =>
          df.col(f.name).cast(st)
        case _ => df.col(f.name)
      }
      c.as(f.name, f.metadata)
    }.toSeq
    val selected = df.select(cols: _*)
    // CHECK constraints ride the write pass itself: one codegen'd filter
    // whose assert_true throws (with the constraint name) on the first
    // violating row — zero extra scans at any scale. SQL semantics: a NULL
    // check passes. Existing rows were validated when the constraint was
    // added, so rewrites of old data can never trip here.
    val base = GraftTable.constraintsOf(md).foldLeft(selected) {
      case (d, (name, check)) =>
        import org.apache.spark.sql.functions.{assert_true, coalesce, expr, lit}
        d.filter(assert_true(coalesce(expr(check), lit(true)),
          lit(s"CHECK constraint '$name' violated: $check")).isNull)
    }
    // hidden partitioning: group rows by the transforms so each file covers
    // ONE partition tuple (the derived columns live only in dir names —
    // partitionBy removes them from file contents, keeping old and new files
    // column-identical)
    val specs = specsOf(md, sch)
    val prepared = specs.foldLeft(base)((df, sp) => df.withColumn(sp.name, sp.column(sch)))
    val writer = prepared.write
      // parquet drops chunk stats entirely once min+max exceed ~4 KB, which
      // silences pruning for document-sized string columns; truncating at
      // write time (sound: prefix min, incremented-prefix max) keeps bounds
      // for every string column at any value size
      .option("parquet.statistics.truncate.length", "64")
    // per-column parquet BLOOM FILTERS (table property `bloom-columns`,
    // comma-separated): point lookups / IN probes on a key column skip
    // row groups whose min/max would admit them — at a 10^12-row corpus
    // the difference between "read the row group" and "skip it" for the
    // overwhelming majority of url point queries. Names not (or no
    // longer, after a rename) in the schema are skipped silently — bloom
    // is an optimization, never a correctness dependency.
    val bloomCols = md.properties.get(GraftTable.BloomColumnsProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .flatMap(c => sch.fieldNames.find(_.equalsIgnoreCase(c))) // schema spelling
    val withBloom = bloomCols.foldLeft(writer)((w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    // roll to a new file every N records WITHIN a task: sorted partition
    // runs split into right-sized files without extra partitions (order and
    // per-file min/max tightness preserved — each file is a sorted run)
    val withRoll =
      if (maxRecordsPerFile > 0) withBloom.option("maxRecordsPerFile", maxRecordsPerFile.toString)
      else withBloom
    (if (specs.isEmpty) withRoll else withRoll.partitionBy(specs.map(_.name): _*))
      .mode("errorifexists").parquet(dir)
    val written = stampBucketIds(specs, FileIO.listFilesRecursively(dir, ".parquet"))
    StatsCollector.collect(spark, sch, root, written, commitUuid)
  }

  /** Stamp Spark's bucket-id file-name suffix (`part-…_00007.snappy.parquet`)
    * onto freshly written files of a `bucket(n, col)`-partitioned table. The
    * id is the file's OWN partition-dir value — `partitionBy` above grouped
    * rows by the transform, so every file is bucket-pure by construction —
    * and the suffix is spelled via Spark's own `BucketingUtils` formatter so
    * write-side stamp and read-side parse can never drift. The stamp is what
    * lets [[read]] attach a `BucketSpec` ([[bucketSpecOf]]): the scan then
    * reports `HashPartitioning(col, n)` and joins/aggregations on the bucket
    * column skip their shuffle entirely. Renames happen pre-commit inside the
    * fresh commit dir — no reader can ever hold the unstamped name. */
  private def stampBucketIds(specs: Seq[PartitionSpec], absPaths: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.graftshim.GraftRelation
    val bucketSpecs = specs.filter(_.transform == "bucket")
    if (bucketSpecs.size != 1) return absPaths
    val sp = bucketSpecs.head
    absPaths.map { p =>
      val slash = p.lastIndexOf('/')
      val name = p.substring(slash + 1)
      sp.dirValue(p).flatMap(v => scala.util.Try(v.toInt).toOption) match {
        case Some(b) if GraftRelation.bucketIdOf(name).isEmpty =>
          val dot = name.indexOf('.')
          val stamped =
            if (dot < 0) name + GraftRelation.bucketIdSuffix(b)
            else name.substring(0, dot) + GraftRelation.bucketIdSuffix(b) + name.substring(dot)
          // paranoia: only keep a stamp Spark parses back to the same id
          if (GraftRelation.bucketIdOf(stamped).contains(b)) {
            val to = p.substring(0, slash + 1) + stamped
            FileIO.rename(p, to)
            to
          } else p
        case _ => p // pre-stamped or un-bucketed dir: leave as written
      }
    }
  }

  /** Append-only commit: parent manifests + one new manifest.
    * `propertyUpdates` land atomically in the same metadata version (e.g.
    * the streaming batch-id watermark). */
  /** Write-time clustering (table property `write.sort-order`, a
    * comma-separated column list): appends sort each task's rows by the
    * listed columns before writing, so every new file is a sorted run with
    * TIGHT min/max bounds on the sort prefix — incremental clustering paid
    * as one in-task sort (no shuffle, no extra pass), where a full
    * `OPTIMIZE … ZORDER` rewrite stays the deep-clustering tool. Names not
    * (or no longer) in the schema are skipped — like `bloom-columns`, an
    * optimization, never a correctness dependency. */
  private def applyWriteSortOrder(md: TableMetadata, df: DataFrame): DataFrame = {
    val cols = md.properties.get(GraftTable.SortOrderProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .flatMap(c => schemaOf(md).fieldNames.find(_.equalsIgnoreCase(c)))
    if (cols.isEmpty) df
    else df.sortWithinPartitions(cols.map(org.apache.spark.sql.functions.col): _*)
  }

  def append(
      df: DataFrame,
      summary: Map[String, String] = Map.empty,
      propertyUpdates: Map[String, String] = Map.empty,
      toBranch: Option[String] = None,
      mergeSchema: Boolean = false): Snapshot = {
    if (mergeSchema) mergeSchemaFor(df)
    val md = metadata
    // `write.max-records-per-file` rolls each task's (sorted) run into
    // bounded files — with `write.sort-order` that is what makes the
    // per-file min/max TIGHT (a sorted task writing one giant file still
    // spans the full range); also the generic file-size governor for
    // producers that can't size their partitions
    val maxRec = md.properties.get(GraftTable.MaxRecordsPerFileProp)
      .map(_.toLong).filter(_ > 0).getOrElse(0L)
    val metas = writeDataFiles(applyWriteSortOrder(md, df), maxRecordsPerFile = maxRec)
    commit("append", propertyUpdates = propertyUpdates, toBranch = toBranch) { parent =>
      val mf = writeManifest(metas)
      (parent.map(_.manifests).getOrElse(Seq.empty) :+ mf,
        summary ++ Map(
          "added-files" -> metas.size.toString,
          "added-rows" -> metas.map(_.rows).sum.toString,
          "added-bytes" -> metas.map(_.bytes).sum.toString))
    }
  }

  /**
   * Replace-files commit (compaction / clustering / merge): removes
   * `removedPaths`, adds `added`, keeps untouched manifests as-is and
   * rewrites only manifests that lost files.
   */
  def replaceFiles(
      removedPaths: Set[String],
      added: Seq[DataFileMeta],
      op: String,
      summary: Map[String, String] = Map.empty,
      expectedSnapshotId: Option[Long] = None,
      clearDeletes: Boolean = false,
      propertyUpdates: Map[String, String] = Map.empty): Snapshot =
    commitFull(op, expectedSnapshotId, propertyUpdates) { parent =>
      val parentManifests = parent.map(_.manifests).getOrElse(Seq.empty)
      val kept = scala.collection.mutable.ArrayBuffer.empty[ManifestMeta]
      var removedCount = 0
      for (m <- parentManifests) {
        val entries = readManifest(m.path)
        val (gone, stay) = entries.partition(e => removedPaths.contains(e.path))
        removedCount += gone.size
        if (gone.isEmpty) kept += m
        else if (stay.nonEmpty) kept += writeManifest(stay)
      }
      require(removedCount == removedPaths.size,
        s"$op: ${removedPaths.size - removedCount} files to remove not present in current snapshot (concurrent rewrite?)")
      val manifests = if (added.nonEmpty) kept.toSeq :+ writeManifest(added) else kept.toSeq
      // materializing live tombstones physically REMOVES rows, so the commit
      // is not row-preserving even under a "cluster" op — flagged in the
      // summary so incrementalRead treats it as row-changing
      val materialized = clearDeletes && parent.exists(_.deleteManifestList.nonEmpty)
      // position deletes clear EXACTLY per rewritten file (the rewrite read
      // those files through withPositionDeletes, so their DV rows are
      // applied); untouched files keep theirs — no full-coverage condition
      val (posDeletes, dvCleared) = rewritePosDeletes(parent, removedPaths)
      // clearDeletes: ONLY sound when the rewrite read every current data
      // file with tombstones applied (full-table cluster rewrite)
      (manifests,
        if (clearDeletes) None else parent.flatMap(_.deleteManifests),
        posDeletes,
        summary ++ (if (materialized) Map("materialized-tombstones" -> "true") else Map.empty) ++
          (if (dvCleared > 0) Map("materialized-position-deletes" -> dvCleared.toString) else Map.empty) ++ Map(
          "removed-files" -> removedPaths.size.toString,
          "added-files" -> added.size.toString,
          "added-rows" -> added.map(_.rows).sum.toString,
          "added-bytes" -> added.map(_.bytes).sum.toString))
    }

  /**
   * Optimistic-concurrency commit loop. `build` receives the parent snapshot
   * and returns (manifest list, summary). On a lost race: appends re-apply
   * against the new parent; rewrites require the parent they planned against
   * (`expectedSnapshotId`) and fail fast otherwise — the caller replans.
   * Parent tombstones are carried forward unchanged; use [[commitFull]] to
   * alter them.
   */
  def commit(op: String, expectedSnapshotId: Option[Long] = None,
      propertyUpdates: Map[String, String] = Map.empty,
      toBranch: Option[String] = None)(
      build: Option[Snapshot] => (Seq[ManifestMeta], Map[String, String])): Snapshot =
    commitFull(op, expectedSnapshotId, propertyUpdates, toBranch = toBranch) { parent =>
      val (manifests, summary) = build(parent)
      (manifests, parent.flatMap(_.deleteManifests), parent.flatMap(_.posDeleteManifests), summary)
    }

  /** [[commit]] with explicit control of the delete-manifest (tombstone)
    * list of the new snapshot. `schemaUpdate` lands the new table schema
    * atomically in the same metadata version (rename/drop evolution). */
  def commitFull(op: String, expectedSnapshotId: Option[Long] = None,
      propertyUpdates: Map[String, String] = Map.empty,
      schemaUpdate: Option[StructType] = None,
      toBranch: Option[String] = None)(
      build: Option[Snapshot] => (Seq[ManifestMeta], Option[Seq[ManifestMeta]], Option[Seq[ManifestMeta]], Map[String, String])): Snapshot = {
    require(toBranch.isEmpty || schemaUpdate.isEmpty,
      s"$op: schema evolution commits to main only, not a branch")
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      val v = currentVersion
      val md = metadataAt(v)
      // a branch commit's parent is the BRANCH head; main's pointer is
      // untouched — the snapshot joins the log, only the ref moves
      val parent = toBranch match {
        case None => md.currentSnapshot
        case Some(b) =>
          val r = md.refMap.getOrElse(b, throw new IllegalArgumentException(
            s"$op: unknown branch '$b' on $root — create it with createBranch"))
          require(r.kind == "branch", s"$op: ref '$b' is a ${r.kind}, not a branch")
          Some(md.snapshot(r.snapshotId).getOrElse(throw new IllegalStateException(
            s"$op: branch '$b' head ${r.snapshotId} is not a retained snapshot")))
      }
      for (expected <- expectedSnapshotId)
        require(parent.map(_.id).contains(expected),
          s"$op planned against snapshot $expected but current is ${parent.map(_.id)}: concurrent commit, replan required")
      val (manifests, deleteManifests, posDeletes, summary) = build(parent)
      val snap = Snapshot(
        id = md.lastSnapshotId + 1,
        parentId = parent.map(_.id),
        timestampMs = System.currentTimeMillis(),
        operation = op,
        manifests = manifests,
        summary = summary ++ toBranch.map("branch" -> _),
        deleteManifests = deleteManifests.filter(_.nonEmpty),
        posDeleteManifests = posDeletes.filter(_.nonEmpty))
      val next = md.copy(
        currentSnapshotId = if (toBranch.isEmpty) Some(snap.id) else md.currentSnapshotId,
        snapshots = md.snapshots :+ snap,
        lastSnapshotId = snap.id,
        properties = md.properties ++ propertyUpdates,
        schemaDdl = schemaUpdate.map(_.toDDL).getOrElse(md.schemaDdl),
        schemaJson = schemaUpdate.map(_.json).orElse(md.schemaJson),
        refs = toBranch.map { b =>
          val r = md.refMap(b) // validated above
          // the branch base (divergence point, stamped at createBranch)
          // survives every staged commit; a pre-tracking branch keeps None —
          // inventing one from the current HEAD would record a staged commit
          // as the divergence point and mis-pin expiry / mislead publish
          md.refMap.updated(b, RefMeta(snap.id, "branch", r.baseSnapshotId))
        }.map(Some(_)).getOrElse(md.refs))
      if (FileIO.putIfAbsent(s"$metadataDir/v${v + 1}.json", MetaJson.write(next))) {
        FileIO.writeString(hintPath, (v + 1).toString)
        return snap
      }
      // lost the race; loop re-reads and (for appends) re-applies
    }
    throw new IllegalStateException(s"$op: commit failed after 10 attempts")
  }

  /**
   * Move the current-snapshot pointer back to a retained snapshot — an
   * instant, data-free undo of any maintenance pass (the reference's only
   * recourse was re-running the job; its DROP/RENAME swap destroyed the old
   * table). Abandoned snapshots stay in the log (redo is another rollback)
   * until expiry ages them out; snapshot ids remain monotonic, so a
   * post-rollback commit never reuses an id.
   */
  def rollback(toSnapshotId: Long): TableMetadata =
    commitMetadataUpdate { md =>
      require(md.snapshot(toSnapshotId).nonEmpty,
        s"cannot roll back to unknown or expired snapshot $toSnapshotId")
      // schema-evolution commits store the NEW schema and retired names
      // TABLE-WIDE (not per snapshot): pointing the snapshot back across
      // one would pair old manifests (old stats keys) with the new schema
      // — pruning dies silently and a dropped column cannot come back.
      // Refuse instead of corrupting; ids are monotonic, so any evolution
      // commit newer than the target (any branch) blocks.
      md.snapshots.find(s => s.id > toSnapshotId &&
          Set("rename-column", "drop-column", "widen-column")(s.operation)).foreach(s =>
        throw new IllegalArgumentException(
          s"cannot roll back across schema-evolution snapshot ${s.id} " +
            s"('${s.operation}': ${s.summary.getOrElse(s.operation, "")}) — " +
            "the table schema is not versioned per snapshot"))
      md.copy(currentSnapshotId = Some(toSnapshotId))
    }

  // ---- named snapshot refs (tags) ---------------------------------------

  /** Named snapshot refs: tag name → pinned snapshot. */
  def refs: Map[String, RefMeta] = metadata.refMap

  /** Snapshot id a ref name resolves to; error lists known refs. */
  def refSnapshotId(name: String): Long =
    metadata.refMap.getOrElse(name, throw new IllegalArgumentException(
      s"unknown ref '$name' on $root — known refs: " +
        (if (refs.isEmpty) "(none)" else refs.keys.toSeq.sorted.mkString(", ")))).snapshotId

  /**
   * Tag a retained snapshot with a stable name (Iceberg-style ref): the
   * snapshot becomes addressable as `VERSION AS OF '<name>'` and is PINNED
   * against [[graft.ops.Expire.expire]] (the tag holds the snapshot and
   * every file it references until the tag is dropped) — the lakehouse
   * form of a release/audit label over the reference's one-mutable-table
   * world, where no historical state was addressable at all.
   *
   * Names must not look like snapshot ids (they share the `VERSION AS OF`
   * namespace) and must be path/SQL-safe. `replace=true` atomically moves
   * an existing tag.
   */
  def createTag(name: String, snapshotId: Option[Long] = None,
      replace: Boolean = false): TableMetadata =
    createRef(name, "tag", snapshotId, replace)

  /**
   * Create a BRANCH: a movable ref `append(df, toBranch = Some(name))`
   * commits onto without touching the main pointer — the write-audit-publish
   * staging lane (stage appends on a branch, validate them, [[fastForward]]
   * main). Branches are append+read only; maintenance and MERGE target main.
   * Like tags, a branch head pins its snapshot (and files) against expiry.
   */
  def createBranch(name: String, snapshotId: Option[Long] = None,
      replace: Boolean = false): TableMetadata =
    createRef(name, "branch", snapshotId, replace)

  private def createRef(name: String, kind: String, snapshotId: Option[Long],
      replace: Boolean): TableMetadata = {
    require(name.matches("[A-Za-z0-9._-]+"),
      s"ref name '$name' must match [A-Za-z0-9._-]+")
    require(name.toLongOption.isEmpty,
      s"ref name '$name' would be ambiguous with a snapshot id in VERSION AS OF")
    commitMetadataUpdate { md =>
      val id = snapshotId.orElse(md.currentSnapshotId).getOrElse(
        throw new IllegalArgumentException(s"cannot $kind an empty table (no snapshots)"))
      require(md.snapshot(id).nonEmpty,
        s"cannot $kind unknown or expired snapshot $id")
      md.refMap.get(name).foreach { existing =>
        require(replace && existing.kind == kind,
          s"ref '$name' already exists (${existing.kind} at snapshot ${existing.snapshotId}); " +
            (if (existing.kind == kind) s"pass replace=true / CREATE OR REPLACE to move it"
             else s"a ${existing.kind} cannot be replaced by a $kind — drop it first"))
      }
      md.copy(refs = Some(md.refMap.updated(name,
        RefMeta(id, kind, if (kind == "branch") Some(id) else None))))
    }
  }

  /** Drop a tag — the snapshot stays until expiry ages it out normally. */
  def dropTag(name: String, ifExists: Boolean = false): TableMetadata =
    dropRef(name, "tag", ifExists)

  /** Drop a branch — its staged snapshots stay until expiry GCs them. */
  def dropBranch(name: String, ifExists: Boolean = false): TableMetadata =
    dropRef(name, "branch", ifExists)

  private def dropRef(name: String, kind: String, ifExists: Boolean): TableMetadata =
    commitMetadataUpdate { md =>
      md.refMap.get(name) match {
        case None if ifExists => md
        case None => throw new IllegalArgumentException(
          s"unknown ref '$name' on $root — known refs: " +
            (if (md.refMap.isEmpty) "(none)" else md.refMap.keys.toSeq.sorted.mkString(", ")))
        case Some(r) =>
          require(r.kind == kind, s"ref '$name' is a ${r.kind}, not a $kind")
          md.copy(refs = Some(md.refMap - name).filter(_.nonEmpty))
      }
    }

  /**
   * Publish a branch: move MAIN to the branch head, required to be a pure
   * fast-forward (main's current snapshot is an ancestor of the branch
   * head — nothing committed to main since the branch diverged). The
   * ancestry requirement also refuses crossing a main-side schema-evolution
   * commit, which by construction breaks ancestry. The branch ref stays
   * (now pointing at main's snapshot); drop it when done.
   */
  def fastForward(branch: String): TableMetadata =
    commitMetadataUpdate { md =>
      val r = md.refMap.getOrElse(branch, throw new IllegalArgumentException(
        s"unknown ref '$branch' on $root"))
      require(r.kind == "branch", s"ref '$branch' is a ${r.kind}, not a branch")
      val head = r.snapshotId
      val mainId = md.currentSnapshotId.getOrElse(
        throw new IllegalArgumentException("cannot fast-forward an empty table"))
      if (mainId == head) md
      else {
        // walk the branch head's parent chain looking for main's snapshot
        var cur = md.snapshot(head)
        var found = false
        while (cur.nonEmpty && !found) {
          found = cur.get.parentId.contains(mainId)
          cur = cur.get.parentId.flatMap(md.snapshot)
        }
        require(found,
          s"cannot fast-forward: main snapshot $mainId is not an ancestor of " +
            s"branch '$branch' head $head — main advanced since the branch " +
            "diverged (publish(branch) cherry-picks staged appends onto the " +
            "new head, or RESTORE main first)")
        // main now == head: the divergence point moves up, so expiry stops
        // pinning the published chain and normal retention applies to it
        md.copy(currentSnapshotId = Some(head),
          refs = Some(md.refMap.updated(branch, RefMeta(head, "branch", Some(head)))))
      }
    }

  /**
   * Publish a branch even when MAIN ADVANCED during staging: fast-forward
   * when possible ([[fastForward]] semantics), otherwise CHERRY-PICK — one
   * "publish" commit on main whose manifest list is main's plus every
   * manifest the staged appends added. Sound because branch commits are
   * append-only (each staged manifest is a closed set of immutable files;
   * re-anchoring it onto a different parent cannot change a row) and
   * main-side rewrites touched disjoint files, so without this the common
   * case — a compaction/cluster/merge landing on main mid-staging — forced
   * a full re-stage. Equality-delete semantics are preserved: tombstones
   * added on main during staging suppress matching staged keys exactly as
   * they would suppress a plain append's rows.
   *
   * Refusals (each a measured hazard, not caution):
   *  - a schema-evolution commit newer than the branch base — rename/drop
   *    stats-key remaps and widen's float-stats strip rewrote only MAIN's
   *    manifests, so staged manifests would carry pre-evolution stats keys
   *    (unknown-bounds at best, unsound widened-float pruning at worst);
   *    mirrors [[rollback]]'s guard;
   *  - the base is no longer an ancestor of main (RESTORE crossed the
   *    divergence point — the staged work was built on abandoned history);
   *  - a pre-base-tracking branch (no recorded divergence point).
   *
   * The branch ref then points at the publish commit with a fresh base, so
   * staging can continue on the same branch. Idempotent at head.
   */
  def publish(branch: String): TableMetadata =
    commitMetadataUpdate { md =>
      val r = md.refMap.getOrElse(branch, throw new IllegalArgumentException(
        s"unknown ref '$branch' on $root"))
      require(r.kind == "branch", s"ref '$branch' is a ${r.kind}, not a branch")
      val head = r.snapshotId
      val mainId = md.currentSnapshotId.getOrElse(
        throw new IllegalArgumentException("cannot publish onto an empty table"))
      def ancestorOf(start: Long, target: Long): Boolean = {
        var cur = md.snapshot(start)
        while (cur.nonEmpty) {
          if (cur.get.id == target) return true
          cur = cur.get.parentId.flatMap(md.snapshot)
        }
        false
      }
      if (mainId == head)
        md.copy(refs = Some(md.refMap.updated(branch, RefMeta(head, "branch", Some(head)))))
      else if (ancestorOf(head, mainId))
        md.copy(currentSnapshotId = Some(head),
          refs = Some(md.refMap.updated(branch, RefMeta(head, "branch", Some(head)))))
      else {
        val base = r.baseSnapshotId.getOrElse(throw new IllegalArgumentException(
          s"branch '$branch' predates divergence-point tracking — " +
            "re-stage to publish onto an advanced main"))
        md.snapshots.find(s => s.id > base &&
            Set("rename-column", "drop-column", "widen-column")(s.operation)).foreach(s =>
          throw new IllegalArgumentException(
            s"cannot publish '$branch' across schema-evolution snapshot ${s.id} " +
              s"('${s.operation}': ${s.summary.getOrElse(s.operation, "")}) — staged " +
              "manifests carry pre-evolution stats keys; re-stage on the new schema"))
        require(ancestorOf(mainId, base),
          s"cannot publish '$branch': its base $base is not an ancestor of main " +
            s"$mainId (main was restored past the divergence point — re-stage)")
        val chain = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
        var cur = md.snapshot(head)
        while (cur.nonEmpty && cur.get.id != base) {
          chain += cur.get
          cur = cur.get.parentId.flatMap(md.snapshot)
        }
        require(cur.nonEmpty,
          s"branch '$branch' chain from $head to base $base is broken (expired snapshot?)")
        chain.foreach(s => require(s.operation == "append",
          s"staged snapshot ${s.id} is a '${s.operation}' commit; " +
            "only appends can be cherry-picked"))
        val addedManifests = chain.reverse.flatMap { s =>
          val pm = s.parentId.flatMap(md.snapshot)
            .map(_.manifests.map(_.path).toSet).getOrElse(Set.empty)
          s.manifests.filterNot(m => pm.contains(m.path))
        }
        val mainHead = md.snapshot(mainId).getOrElse(throw new IllegalStateException(
          s"main snapshot $mainId is not retained"))
        val snap = Snapshot(
          id = md.lastSnapshotId + 1,
          parentId = Some(mainId),
          timestampMs = System.currentTimeMillis(),
          operation = "publish",
          manifests = mainHead.manifests ++ addedManifests,
          summary = Map(
            "branch" -> branch,
            "staged-commits" -> chain.size.toString,
            "added-files" -> addedManifests.map(_.fileCount).sum.toString,
            "added-rows" -> addedManifests.map(_.rows).sum.toString,
            "added-bytes" -> addedManifests.map(_.bytes).sum.toString),
          deleteManifests = mainHead.deleteManifests,
          // main's position deletes reference main's files, all of which
          // remain; staged files are NEW files no DV can reference — so the
          // carry-forward is exact (file-scoped semantics, unlike the
          // equality tombstones above, which do suppress staged keys)
          posDeleteManifests = mainHead.posDeleteManifests)
        md.copy(
          currentSnapshotId = Some(snap.id),
          snapshots = md.snapshots :+ snap,
          lastSnapshotId = snap.id,
          refs = Some(md.refMap.updated(branch, RefMeta(snap.id, "branch", Some(snap.id)))))
      }
    }

  /** Snapshot-isolated read of the snapshot a tag points at. */
  def readRef(name: String): DataFrame = readSnapshot(refSnapshotId(name))

  /** Refs as a DataFrame (``graft.`path`.refs`` metadata table);
    * `base_snapshot_id` is a branch's divergence point (null for tags). */
  def refsDf: DataFrame = {
    import spark.implicits._
    metadata.refMap.toSeq.sortBy(_._1).map { case (n, r) =>
      (n, r.kind, r.snapshotId, r.baseSnapshotId)
    }.toDF("name", "kind", "snapshot_id", "base_snapshot_id")
  }

  /**
   * Schema evolution: append a nullable column. Existing data files simply
   * lack the Parquet column — the reader yields NULL, and stats pruning
   * treats absent bounds as "unknown", so scans over old files stay sound.
   * On field-id tables the new column takes a NEVER-REUSED id from the
   * `next-field-id` counter: a column dropped and re-added under the same
   * name must NOT resurrect old files' values.
   */
  /**
   * Auto schema evolution (Delta's `mergeSchema`): add, as nullable columns,
   * every TOP-LEVEL column the incoming frame carries that the table lacks
   * (session-resolver name matching), so a producer can start shipping a new
   * field without a coordinated DDL step. Additive only: existing columns
   * keep their types (a mismatched type still fails the write loudly), new
   * nested fields inside existing structs are NOT inferred (add those
   * explicitly — an accidental struct reshape should not mutate the schema),
   * and [[addColumn]]'s guards apply (retired names refuse; field ids are
   * never reused). Each add is its own CAS'd metadata commit; old files read
   * NULL and pruning treats absent bounds as unknown, so scans stay sound.
   */
  /** Live CHECK constraints: name → SQL predicate text. */
  def constraints: Map[String, String] = GraftTable.constraintsOf(metadata)

  /**
   * Add a CHECK constraint (Delta-style data-quality gate): every
   * subsequent write refuses rows for which `check` evaluates to FALSE
   * (NULL passes, SQL semantics) — enforced INLINE in the write pass (one
   * codegen'd filter inside [[writeDataFiles]]; no extra scan per write).
   * EXISTING rows are validated here, once, so rewrites (compaction /
   * clustering) can never trip a constraint on pre-existing data. A
   * concurrent write landing during validation forces a loud retry rather
   * than slipping unvalidated rows in.
   */
  def addConstraint(name: String, check: String): TableMetadata = {
    require(name.matches("[A-Za-z0-9._-]+"), s"invalid constraint name '$name'")
    val key = GraftTable.ConstraintPrefix + name
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val validatedAt = metadata.currentSnapshotId
    val violations = read().filter(!coalesce(expr(check), lit(true))).count()
    require(violations == 0,
      s"cannot add CHECK constraint '$name': $violations existing rows violate ($check)")
    commitMetadataUpdate { md =>
      require(!md.properties.contains(key), s"constraint '$name' already exists")
      require(md.currentSnapshotId == validatedAt,
        s"table changed while validating constraint '$name' — retry")
      md.copy(properties = md.properties + (key -> check))
    }
  }

  def dropConstraint(name: String, ifExists: Boolean = false): TableMetadata =
    commitMetadataUpdate { md =>
      val key = GraftTable.ConstraintPrefix + name
      if (!md.properties.contains(key) && !ifExists)
        throw new IllegalArgumentException(s"unknown constraint '$name' — known: " +
          (if (GraftTable.constraintsOf(md).isEmpty) "(none)"
           else GraftTable.constraintsOf(md).keys.toSeq.sorted.mkString(", ")))
      md.copy(properties = md.properties - key)
    }

  def mergeSchemaFor(df: DataFrame): Unit = {
    val resolver = spark.sessionState.analyzer.resolver
    val cur = schema
    df.schema.fields
      .filterNot(f => cur.fields.exists(t => resolver(t.name, f.name)))
      .foreach(f => addColumn(f.copy(nullable = true)))
  }

  def addColumn(field: org.apache.spark.sql.types.StructField): TableMetadata = {
    require(field.nullable, s"new column ${field.name} must be nullable (old files have no values)")
    require(!field.name.contains("."),
      s"ADD COLUMN '${field.name}': dotted names are not supported here — use " +
        "addField(parentPath, field) (SQL: ADD COLUMNS (struct.leaf TYPE)) to add a " +
        "nested field inside a struct")
    commitMetadataUpdate { md =>
      val cur = schemaOf(md)
      require(!cur.fieldNames.exists(_.equalsIgnoreCase(field.name)),
        s"column ${field.name} already exists")
      require(!retiredOf(md).contains(field.name.toLowerCase),
        s"column name ${field.name} was previously dropped or renamed away; existing " +
          "files still carry a physical column of that name, and parquet filter " +
          "pushdown matches by NAME — rewrite the table (full cluster) to reclaim it")
      if (!GraftTable.hasFieldIds(cur)) {
        // legacy (pre-field-id) table: stay name-resolved
        md.copy(schemaDdl = StructType(cur.fields :+ field).toDDL, schemaJson = None)
      } else {
        val nextId = md.properties.get(GraftTable.NextFieldIdProp).map(_.toInt)
          .getOrElse(GraftTable.maxFieldId(cur) + 1)
        // struct-typed additions consume one id per interior field too, so
        // their leaves are evolvable later like any created-with-the-table struct
        val (withId, consumed) = GraftTable.stampIdsDeep(field, nextId)
        val next = StructType(cur.fields :+ withId)
        md.copy(schemaDdl = next.toDDL, schemaJson = Some(next.json),
          properties = md.properties + (GraftTable.NextFieldIdProp -> consumed.toString))
      }
    }
  }

  /**
   * Rename a column WITHOUT rewriting any data file. Readable across file
   * generations because columns resolve by stable parquet FIELD ID (public
   * Spark: `spark.sql.parquet.fieldId.read.enabled` — the requested schema
   * keeps the renamed field's id, so old files' differently-named physical
   * column still binds). Per-file stats keys are remapped in a metadata-only
   * manifest rewrite committed atomically with the schema change, so
   * min/max pruning on the NEW name keeps working for old files. The
   * reference's only rename path was regenerating DDL + reloading the whole
   * table (`hive/HiveTableIR.java:519-590`).
   *
   * Refused when: the table predates field ids (files resolve by name — a
   * rename would silently NULL old files' data); the column drives a hidden
   * partition transform (directory names are physical); tombstones are live
   * (their key columns are physical parquet names).
   */
  def renameColumn(from: String, to: String): Snapshot =
    evolveSchema("rename-column", s"$from->$to", retire = Seq(from)) { sch =>
      val path = resolvePath(sch, from, "RENAME COLUMN")
      require(!to.contains("."), s"RENAME COLUMN to '$to': dotted column names are not supported")
      val fld = fieldAt(sch, path)
      // parquet GROUP nodes (struct/array/map) never re-bind after a rename:
      // ids on groups do not resolve in ANY reader path (verified empirically
      // on this Spark — leaf ids do, group ids do not), so a renamed complex
      // column would silently read as NULL from every old file
      require(fld.dataType match {
        case _: StructType | _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType => false
        case _ => true
      }, s"RENAME COLUMN '$from': ${fld.dataType.simpleString} columns cannot be " +
        "renamed in place — parquet group nodes resolve by NAME (field ids re-bind " +
        "leaves, not groups); rename requires a table rewrite")
      val parent = parentStruct(sch, path)
      require(!parent.fieldNames.exists(_.equalsIgnoreCase(to)),
        s"column $to already exists" +
          (if (path.size > 1) s" in struct ${path.init.mkString(".")}" else ""))
      val newPath = (path.init :+ to).mkString(".")
      require(!retired.contains(newPath.toLowerCase),
        s"column name $newPath was previously dropped or renamed away; existing files " +
          "still carry a physical column of that name, and parquet filter pushdown " +
          "matches by NAME — rewrite the table (full cluster) to reclaim it")
      evolutionGuards(sch, path.head, "rename")
      if (path.size == 1) {
        val idx = sch.fieldIndex(from)
        (StructType(sch.fields.updated(idx, sch.fields(idx).copy(name = to))),
          Some((k: String) => Some(if (k == from) to else k)))
      } else {
        nestedGuards(sch, path, "rename")
        // nested fields carry no manifest stats keys — metadata-only commit,
        // manifests reused verbatim
        (rebuildAt(sch, path.init, st =>
          StructType(st.fields.updated(st.fieldIndex(path.last),
            st.fields(st.fieldIndex(path.last)).copy(name = to)))), None)
      }
    }

  /**
   * Drop a column WITHOUT rewriting any data file: the field (and its id)
   * leaves the schema, projection simply stops reading it, and its stats
   * keys are stripped from the manifests. The vacated NAME is permanently
   * retired (see [[GraftTable.RetiredColumnsProp]] for why reintroducing it
   * would corrupt filter pushdown against old files). Same refusal
   * conditions as [[renameColumn]].
   */
  def dropColumn(name: String): Snapshot = dropColumns(Seq(name))

  /** Multi-column drop in ONE atomic commit — a failed validation on any
    * column must not leave earlier columns already (irreversibly) dropped. */
  def dropColumns(names: Seq[String]): Snapshot = {
    require(names.nonEmpty && names.distinct.size == names.size,
      s"duplicate column in DROP: ${names.mkString(", ")}")
    evolveSchema("drop-column", names.mkString(","), retire = names) { sch =>
      val paths = names.map(resolvePath(sch, _, "DROP COLUMN"))
      val (top, nested) = paths.partition(_.size == 1)
      require(sch.fields.length > top.size, "cannot drop every column")
      paths.foreach(p => evolutionGuards(sch, p.head, "drop"))
      nested.foreach { p =>
        nestedGuards(sch, p, "drop")
        require(parentStruct(sch, p).fields.length > 1,
          s"cannot drop the last field of struct ${p.init.mkString(".")} — " +
            "drop the struct column itself")
      }
      val topNames = top.map(_.head).toSet
      val afterTop = StructType(sch.fields.filterNot(f => topNames.contains(f.name)))
      val next = nested.foldLeft(afterTop)((s, p) => rebuildAt(s, p.init, st =>
        StructType(st.fields.filterNot(_.name == p.last))))
      // a multi-drop must not leave any struct empty (each per-path check
      // above sees the ORIGINAL schema; two drops can empty a 2-field struct)
      def noEmpty(dt: org.apache.spark.sql.types.DataType, at: String): Unit = dt match {
        case st: StructType =>
          require(st.fields.nonEmpty,
            s"cannot drop every field of struct $at — drop the struct column itself")
          st.fields.foreach(f => noEmpty(f.dataType, if (at.isEmpty) f.name else s"$at.${f.name}"))
        case _ => ()
      }
      next.fields.foreach(f => noEmpty(f.dataType, f.name))
      // only top-level drops touch manifest stats keys
      (next, if (topNames.isEmpty) None
             else Some((k: String) => if (topNames.contains(k)) None else Some(k)))
    }
  }

  /**
   * Widen a column's type WITHOUT rewriting any data file — Spark 4's
   * parquet readers (vectorized and row-based, verified incl. predicate
   * pushdown and composition with field-id renames) read a narrower
   * physical type through a wider requested one. Allowed promotions:
   * integral up-casts (byte→short→int→long), int/short/byte→double,
   * float→double.
   *
   * Stats: integral bound strings parse identically under the wider type
   * and are kept; float→double bounds are STRIPPED (a float's decimal
   * string re-parsed as double is not the widened value — boundary
   * pruning could wrongly exclude a file). Works on legacy (id-less)
   * tables too: the column name does not change.
   */
  def widenColumn(name: String, to: org.apache.spark.sql.types.DataType): Snapshot =
    widenColumns(Seq(name -> to))

  /** Multi-column widen in ONE atomic commit — a failed validation on any
    * column must not leave earlier columns already (irreversibly) widened
    * (there is no narrowing path, and rollback refuses to cross a widen). */
  def widenColumns(widens: Seq[(String, org.apache.spark.sql.types.DataType)]): Snapshot = {
    require(widens.nonEmpty && widens.map(_._1).distinct.size == widens.size,
      s"duplicate column in widen: ${widens.map(_._1).mkString(", ")}")
    val detail = widens.map { case (n, t) => s"$n->${t.simpleString}" }.mkString(",")
    evolveSchema("widen-column", detail, retire = Seq.empty) { sch =>
      val strip = scala.collection.mutable.Set.empty[String]
      val next = widens.foldLeft(sch) { case (cur, (name, to)) =>
        val path = resolvePath(cur, name, "ALTER COLUMN TYPE")
        val from = fieldAt(cur, path).dataType
        require(GraftTable.widenOk((from, to)),
          s"cannot widen ${from.simpleString} to ${to.simpleString} for $name " +
            s"(allowed: integral up-casts, integral→double, float→double)")
        // spec/tombstone guards only — no field-id requirement (the NAME
        // path is unchanged, so old files bind by name at any nesting depth)
        allPartitionSpecs.find(_.sourceColumn == path.head).foreach(sp =>
          throw new IllegalArgumentException(
            s"column ${path.head} drives partition transform $sp — bucket hashes differ " +
              "by type; widen requires a table rewrite"))
        // nested leaves carry no manifest bounds; float-stat stripping is a
        // top-level-only concern
        if (from == org.apache.spark.sql.types.FloatType && path.size == 1) strip += name
        if (path.size == 1)
          StructType(cur.fields.updated(cur.fieldIndex(name),
            cur.fields(cur.fieldIndex(name)).copy(dataType = to)))
        else rebuildAt(cur, path.init, st =>
          StructType(st.fields.updated(st.fieldIndex(path.last),
            st.fields(st.fieldIndex(path.last)).copy(dataType = to))))
      }
      require(tombstones().isEmpty,
        "table has live merge-on-read tombstones; materialize them first, then widen")
      (next, if (strip.isEmpty && widens.forall(_._1.contains(".")))
               // all-nested widen touches no stats keys — reuse manifests
               None
             else Some((k: String) => if (strip.contains(k)) None else Some(k)))
    }
  }

  /**
   * Schema evolution INSIDE a struct: append a nullable field to the struct
   * at `parentPath` (dotted for structs-in-structs). Old files lack the leaf
   * and read NULL — on id-ful interiors the new field's fresh id is simply
   * absent from old file groups (verified: absent id → NULL, not error); on
   * legacy (id-less) interiors the field is added WITHOUT an id so schema
   * and files stay consistently name-resolved (mixing an id-ful field into
   * an id-less group ERRORS at read time). SQL surface:
   * `ALTER TABLE graft.`/p`` ADD COLUMNS (meta.extra DOUBLE)`.
   */
  def addField(parentPath: String, field: org.apache.spark.sql.types.StructField): TableMetadata = {
    require(field.nullable, s"new field ${field.name} must be nullable (old files have no values)")
    require(!field.name.contains("."),
      s"ADD COLUMNS '${field.name}': the new field name cannot be dotted (give the " +
        "struct path as the parent, e.g. meta.extra adds extra under meta)")
    commitMetadataUpdate { md =>
      val cur = schemaOf(md)
      val path = resolvePath(cur, parentPath, "ADD COLUMNS")
      val parentField = fieldAt(cur, path)
      val parent = parentField.dataType match {
        case st: StructType => st
        case other => throw new IllegalArgumentException(
          s"ADD COLUMNS: $parentPath is ${other.simpleString}, not a struct")
      }
      require(!parent.fieldNames.exists(_.equalsIgnoreCase(field.name)),
        s"field ${field.name} already exists in struct $parentPath")
      val full = (path :+ field.name).mkString(".").toLowerCase
      require(!retiredOf(md).contains(full),
        s"field name ${(path :+ field.name).mkString(".")} was previously dropped or " +
          "renamed away; existing files still carry a physical column of that name, and " +
          "parquet filter pushdown matches by NAME — rewrite the table to reclaim it")
      // stamp ids only when the ROOT column's interior is fully id-ful
      // (tables created since nested ids; adds preserve the completeness class)
      val rootIdful = GraftTable.hasFieldIds(cur) &&
        GraftTable.nestedIdsComplete(fieldAt(cur, Seq(path.head)).dataType)
      if (!rootIdful) {
        val next = rebuildAt(cur, path, st => StructType(st.fields :+ field))
        md.copy(schemaDdl = next.toDDL,
          schemaJson = if (GraftTable.hasFieldIds(cur)) Some(next.json) else None)
      } else {
        val nextId = md.properties.get(GraftTable.NextFieldIdProp).map(_.toInt)
          .getOrElse(GraftTable.maxFieldId(cur) + 1)
        val (withId, consumed) = GraftTable.stampIdsDeep(field, nextId)
        val next = rebuildAt(cur, path, st => StructType(st.fields :+ withId))
        md.copy(schemaDdl = next.toDDL, schemaJson = Some(next.json),
          properties = md.properties + (GraftTable.NextFieldIdProp -> consumed.toString))
      }
    }
  }

  /** Resolve a possibly-dotted column path to canonical segments. A literal
    * top-level column wins (a pathological name containing a dot); otherwise
    * segments walk STRUCT types only — crossing an array or map is refused
    * (fields inside their elements/values carry no stable ids). */
  private def resolvePath(sch: StructType, name: String, what: String): Seq[String] = {
    if (sch.fieldNames.contains(name)) return Seq(name)
    val parts = name.split("\\.").toSeq
    var cur: org.apache.spark.sql.types.DataType = sch
    val out = Seq.newBuilder[String]
    for (p <- parts) cur match {
      case st: StructType =>
        val idx = st.fieldIndex(p) // throws naming the missing segment
        out += st.fields(idx).name
        cur = st.fields(idx).dataType
      case other => throw new IllegalArgumentException(
        s"$what '$name': path crosses ${other.simpleString} — nested evolution is " +
          "supported through STRUCT fields only (array/map interiors have no stable " +
          "field ids; evolving one requires a table rewrite)")
    }
    out.result()
  }

  private def fieldAt(sch: StructType, path: Seq[String]): org.apache.spark.sql.types.StructField = {
    val head = sch.fields(sch.fieldIndex(path.head))
    if (path.size == 1) head
    else fieldAt(head.dataType.asInstanceOf[StructType], path.tail)
  }

  /** Struct CONTAINING the leaf at `path` (the schema itself for top-level). */
  private def parentStruct(sch: StructType, path: Seq[String]): StructType =
    if (path.size == 1) sch
    else fieldAt(sch, path.init).dataType.asInstanceOf[StructType]

  /** Rebuild the schema with `f` applied to the struct at `parentPath`. */
  private def rebuildAt(sch: StructType, parentPath: Seq[String], f: StructType => StructType): StructType =
    if (parentPath.isEmpty) f(sch)
    else {
      val idx = sch.fieldIndex(parentPath.head)
      val fld = sch.fields(idx)
      val inner = rebuildAt(fld.dataType.asInstanceOf[StructType], parentPath.tail, f)
      StructType(sch.fields.updated(idx, fld.copy(dataType = inner)))
    }

  /** Extra preconditions for evolving a field INSIDE a struct: the root
    * column's interior must be fully id-ful — files written before nested
    * ids existed cannot re-bind a renamed leaf, and an id-ful requested
    * schema over an id-less file group fails the whole read. */
  private def nestedGuards(sch: StructType, path: Seq[String], what: String): Unit =
    require(GraftTable.nestedIdsComplete(fieldAt(sch, Seq(path.head)).dataType),
      s"struct ${path.head} predates nested field ids (its interior fields resolve by " +
        s"NAME only); nested $what requires a table rewrite")

  private def evolutionGuards(sch: StructType, colName: String, what: String): Unit = {
    require(GraftTable.hasFieldIds(sch),
      s"table predates field-id column mapping; $what requires a table rewrite " +
        "(files written without parquet field ids resolve by NAME only)")
    // ALL spec generations: files written under a historical spec still
    // partition-prune by this column's dirs — evolving it away would
    // silently kill that pruning for every pre-evolution file
    allPartitionSpecs.find(_.sourceColumn == colName).foreach(sp =>
      throw new IllegalArgumentException(
        s"column $colName drives partition transform $sp (active or historical) — " +
          s"partition directory names are physical; $what requires a table rewrite"))
    require(tombstones().isEmpty,
      s"table has live merge-on-read tombstones (physical key columns); materialize " +
        s"them first (Cluster.zorderRewrite), then $what")
  }

  /** Names vacated by rename/drop across the table's history (lowercase). */
  def retired: Set[String] = retiredOf(metadata)

  private def retiredOf(md: TableMetadata): Set[String] =
    md.properties.get(GraftTable.RetiredColumnsProp)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  /** Shared rename/drop/widen machinery: one commit carrying the new schema,
    * the stats-remapped manifests, and the vacated name's retirement — all
    * atomic (row-preserving — incremental readers pass through it). `f`
    * returning no remap means no manifest stats key is touched (nested-only
    * evolution: nested leaves carry no bounds) — the parent's manifests are
    * reused verbatim, keeping the commit O(1) regardless of file count. */
  private def evolveSchema(op: String, detail: String, retire: Seq[String])(
      f: StructType => (StructType, Option[String => Option[String]])): Snapshot = {
    val md0 = metadata
    val (nextSchema, remapOpt) = f(schemaOf(md0))
    commitFull(op, expectedSnapshotId = md0.currentSnapshotId,
      propertyUpdates = Map(GraftTable.RetiredColumnsProp ->
        (retiredOf(md0) ++ retire.map(_.toLowerCase)).toSeq.sorted.mkString(",")),
      schemaUpdate = Some(nextSchema)) { parent =>
      val manifests = remapOpt match {
        case None => parent.map(_.manifests).getOrElse(Seq.empty)
        case Some(remapKey) =>
          def remap[V](m: Map[String, V]): Map[String, V] =
            m.flatMap { case (k, v) => remapKey(k).map(_ -> v) }
          parent.map(_.manifests).getOrElse(Seq.empty).map { m =>
            writeManifest(readManifest(m.path).map(e => e.copy(
              minValues = remap(e.minValues),
              maxValues = remap(e.maxValues),
              nullCounts = remap(e.nullCounts))))
          }
      }
      // DV files have their own fixed (_file, _pos) schema — column
      // evolution never touches them; carry forward verbatim
      (manifests, parent.flatMap(_.deleteManifests),
        parent.flatMap(_.posDeleteManifests), Map(op -> detail))
    }
  }

  /** Rewrite the full snapshot list (snapshot expiry). */
  def commitMetadataUpdate(f: TableMetadata => TableMetadata): TableMetadata = {
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      val v = currentVersion
      val next = f(metadataAt(v))
      if (FileIO.putIfAbsent(s"$metadataDir/v${v + 1}.json", MetaJson.write(next))) {
        FileIO.writeString(hintPath, (v + 1).toString)
        return next
      }
    }
    throw new IllegalStateException("metadata update failed after 10 attempts")
  }

  def absPath(f: DataFileMeta): String = s"$root/${f.path}"
}

object GraftTable {

  /** Parquet's native field-id key in StructField metadata — the PUBLIC
    * Spark mechanism (`spark.sql.parquet.fieldId.{read,write}.enabled`)
    * behind rename/drop column evolution. */
  val FieldIdKey = "parquet.field.id"

  /** Table property holding the next never-used field id. */
  val NextFieldIdProp = "next-field-id"

  /** Table-property prefix holding CHECK constraints: `constraint.<name>` →
    * SQL predicate text. Managed via add/dropConstraint (which validate);
    * raw SET/UNSET TBLPROPERTIES refuses the prefix. */
  val ConstraintPrefix = "constraint."

  private[graft] def constraintsOf(md: TableMetadata): Map[String, String] =
    md.properties.collect {
      case (k, v) if k.startsWith(ConstraintPrefix) =>
        k.stripPrefix(ConstraintPrefix) -> v
    }

  /** Table property: comma-separated columns to write parquet bloom
    * filters for (row-group skipping on point/IN lookups). */
  val BloomColumnsProp = "bloom-columns"
  val SortOrderProp = "write.sort-order"
  val MaxRecordsPerFileProp = "write.max-records-per-file"

  /** Table property: comma-separated DEFAULT clustering columns (Delta's
    * `CLUSTER BY` analog) — a bare `OPTIMIZE … ZORDER [HILBERT]` clusters on
    * these instead of the built-in page dims, so a table declares its
    * layout once and every maintenance run (incl. scheduled ones that know
    * nothing about the schema) deep-clusters the same way. `ZORDER BY (…)`
    * still overrides per-run. */
  val ClusterColumnsProp = "cluster-columns"

  /** Stats-space marker: present (stamped by [[create]]) on every table
    * whose manifests store decimal bounds as SCALED decimal strings.
    * Absent = pre-fix manifests may hold raw unscaled parquet values —
    * decimal bounds are then ignored at planning time (sound). */
  val DecimalStatsScaledProp = "decimal-stats-scaled"

  /** Table property listing column NAMES vacated by rename/drop (lowercase,
    * comma-joined). A vacated name can never be reintroduced: existing data
    * files still carry a physical column of that name bound to the OLD
    * field id, and Spark's parquet FILTER PUSHDOWN matches columns by name
    * (not field id) — a predicate on a reintroduced name would prune row
    * groups against the dead column's values and silently drop rows. Field-
    * id clipping itself handles the projection correctly; the pushdown
    * name-match is the reason for the restriction. */
  val RetiredColumnsProp = "retired-columns"

  def hasFieldIds(schema: StructType): Boolean =
    schema.fields.nonEmpty && schema.fields.forall(_.metadata.contains(FieldIdKey))

  /** Type promotions the parquet readers resolve physically (empirically
    * verified on this Spark: vectorized + row-based, with pushdown). */
  val widenOk: Set[(org.apache.spark.sql.types.DataType, org.apache.spark.sql.types.DataType)] = {
    import org.apache.spark.sql.types._
    Set[(DataType, DataType)](
      ByteType -> ShortType, ByteType -> IntegerType, ByteType -> LongType,
      ShortType -> IntegerType, ShortType -> LongType,
      IntegerType -> LongType,
      ByteType -> DoubleType, ShortType -> DoubleType, IntegerType -> DoubleType,
      FloatType -> DoubleType)
  }

  def maxFieldId(schema: StructType): Int = {
    def one(f: org.apache.spark.sql.types.StructField): Int = {
      val own = if (f.metadata.contains(FieldIdKey)) f.metadata.getLong(FieldIdKey).toInt else 0
      f.dataType match {
        case st: StructType => math.max(own, maxFieldId(st))
        case _ => own
      }
    }
    schema.fields.map(one).foldLeft(0)(math.max)
  }

  def fieldWithId(f: org.apache.spark.sql.types.StructField, id: Int): org.apache.spark.sql.types.StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putLong(FieldIdKey, id.toLong).build())

  /** Stamp `f` and (depth-first) every struct field UNDER it with fresh ids
    * starting at `next`; returns the stamped field and the next unused id.
    * Recursion descends STRUCTS only: fields inside array elements / map
    * values are not `StructField`s of the walked type and stay id-less —
    * consistent between schema and written files, so they keep resolving by
    * name (and nested evolution refuses to cross array/map, see
    * `resolvePath`). */
  def stampIdsDeep(f: org.apache.spark.sql.types.StructField, next: Int): (org.apache.spark.sql.types.StructField, Int) = {
    val withId = fieldWithId(f, next)
    f.dataType match {
      case st: StructType =>
        var n = next + 1
        val kids = st.fields.map { c => val (k, n2) = stampIdsDeep(c, n); n = n2; k }
        (withId.copy(dataType = StructType(kids)), n)
      case _ => (withId, next + 1)
    }
  }

  /** Stamp stable field ids (fresh, ignoring any caller-supplied ids — the
    * table owns its id space): pre-order over top-level columns and the
    * struct fields nested under them, so leaf fields inside structs can be
    * renamed/widened later without a rewrite. Flat schemas get 1..n exactly
    * as before. */
  def withFieldIds(schema: StructType): StructType = {
    var n = 1
    StructType(schema.fields.map { f => val (g, n2) = stampIdsDeep(f, n); n = n2; g })
  }

  /** Structural type equality ignoring metadata, nullability, and name case
    * but NOT field order — the shapes under which a positional struct cast
    * is a pure metadata reshape (Cast matches struct fields by POSITION; a
    * reordered frame must not be silently re-assigned). */
  def sameShape(a: org.apache.spark.sql.types.DataType, b: org.apache.spark.sql.types.DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
        f.name.equalsIgnoreCase(g.name) && sameShape(f.dataType, g.dataType) }
    case (x: org.apache.spark.sql.types.ArrayType, y: org.apache.spark.sql.types.ArrayType) =>
      sameShape(x.elementType, y.elementType)
    case (x: org.apache.spark.sql.types.MapType, y: org.apache.spark.sql.types.MapType) =>
      sameShape(x.keyType, y.keyType) && sameShape(x.valueType, y.valueType)
    case _ => a == b // primitives carry no metadata
  }

  /** True when every struct field in the subtree under `dt` carries a field
    * id — the precondition for nested evolution (files written before nested
    * ids existed cannot re-bind a renamed leaf, and an id-ful requested
    * schema over an id-less file group ERRORS rather than degrading). */
  def nestedIdsComplete(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case st: StructType =>
      st.fields.forall(f => f.metadata.contains(FieldIdKey) && nestedIdsComplete(f.dataType))
    case _ => true
  }

  /** Create a new empty table at `root`. */
  def create(
      spark: SparkSession,
      root: String,
      schema: StructType,
      properties: Map[String, String] = Map.empty): GraftTable = {
    require(!FileIO.exists(s"$root/metadata/v1.json"), s"table already exists at $root")
    // validate declared hidden-partitioning specs before anything is written
    properties.get(PartitionSpec.Property).foreach { s =>
      PartitionSpec.parseMulti(s).foreach(_.validate(schema))
    }
    val withIds = withFieldIds(schema)
    val md = TableMetadata(
      formatVersion = 1,
      tableUuid = UUID.randomUUID.toString,
      schemaDdl = schema.toDDL,
      currentSnapshotId = None,
      snapshots = Seq.empty,
      lastSnapshotId = 0L,
      properties = properties +
        (NextFieldIdProp -> (maxFieldId(withIds) + 1).toString) +
        (DecimalStatsScaledProp -> "true"),
      schemaJson = Some(withIds.json))
    FileIO.mkdirs(s"$root/data")
    require(FileIO.putIfAbsent(s"$root/metadata/v1.json", MetaJson.write(md)),
      s"concurrent create at $root")
    FileIO.writeString(s"$root/metadata/version-hint.text", "1")
    new GraftTable(root, spark)
  }

  def load(spark: SparkSession, root: String): GraftTable = {
    require(FileIO.exists(s"$root/metadata/v1.json"), s"no graft table at $root")
    new GraftTable(root, spark)
  }

  def createOrReplace(
      spark: SparkSession,
      root: String,
      schema: StructType,
      properties: Map[String, String] = Map.empty): GraftTable = {
    FileIO.deleteRecursively(root)
    create(spark, root, schema, properties)
  }
}
