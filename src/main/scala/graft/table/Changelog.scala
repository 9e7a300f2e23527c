package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Row-level CDC: per-commit INSERT/DELETE row images (a Delta-CDF-style
 * changelog) for any snapshot range — including merge / update / delete /
 * tombstone commits that the file-level [[GraftTable.incrementalRead]]
 * cannot express. This restores the one capability of the reference the
 * append-only diff lacked: its incremental loads received HBase delete
 * markers via raw scans (`job/JobUtil.java:573-576`, validity checks
 * `adapter/HBaseSourceTableAdapter.java:592-604`) and its HDFS sink split
 * `insert_*`/`delete_*` files for the downstream merge scripts
 * (`adapter/HdfsTargetAdapter.java:37-152`).
 *
 * Output schema: the table columns plus [[Changelog.ChangeTypeCol]]
 * ('insert' | 'delete') and [[Changelog.CommitCol]] (the snapshot id the
 * change committed in). A consumer that folds the events in commit order —
 * `state := (state \ deletes) ∪ inserts` — reconstructs `read()` exactly
 * (proved in StreamCdcSpec).
 *
 * Per-commit semantics (chain-walked like [[GraftTable.incrementalFiles]]):
 *  - append       → the committed files' rows as inserts, with the commit's
 *                   own tombstones applied (a key tombstoned earlier is
 *                   invisible in that snapshot, so it must not be delivered);
 *  - delete-mor   → the parent-visible rows matching the NEWLY added
 *                   tombstone keys, as deletes (file pruning via the key
 *                   set's min/max bounds — the tombstone niche is small);
 *  - delete-pos   → the rows at the NEWLY recorded (file, position) delete
 *                   tuples, as deletes (scan touches only the referenced
 *                   files; positions were taken on the parent-visible view);
 *  - update-pos / merge-pos → the same DV-delta deletes plus the appended
 *                   updated/inserted images as inserts (pairing labels
 *                   in-place changes pre/post);
 *  - merge/update/delete (any copy-on-write file replacement) → the logical
 *    diff of the commit's removed vs added files: removed∖added as deletes,
 *    added∖removed as inserts. Rewritten-but-unchanged rows cancel in the
 *    fingerprint diff ([[slimDiff]]), so the emitted events are the semantic
 *    row changes; cost scales with the commit's touched files, never the
 *    table — and only CHANGED rows' full images ever enter a shuffle.
 *  - compact / cluster / rewrite-manifests / schema evolution → nothing.
 *    This INCLUDES tombstone-materializing rewrites: physically applying
 *    already-delivered equality deletes changes no logical row (their
 *    delete events were emitted at the delete-mor commit) — so changelog
 *    mode has no analog of incrementalRead's materialization refusal.
 *
 * Scale shape: each commit contributes one bounded subplan (its own added/
 * removed files); the CoW diff shuffles 16-byte row fingerprints, not row
 * images ([[slimDiff]]); tombstone key
 * joins broadcast below [[GraftTable.TombstoneBroadcastRowCap]]. Nothing
 * scans the full table except a delete-mor whose keys span every file's
 * bounds — inherent to equality deletes.
 */
object Changelog {

  val ChangeTypeCol = "_change_type"
  val CommitCol = "_commit_snapshot_id"
  val UpdatePreimage = "update_preimage"
  val UpdatePostimage = "update_postimage"

  /** Row-preserving commit operations: no logical row changes to emit.
    * SHARED with [[GraftTable.incrementalFiles]] — one definition, so the
    * changelog and the file-level incremental reader can never disagree on
    * whether a commit kind preserves rows. */
  private[table] val RowPreservingOps: Set[String] =
    Set("compact", "cluster", "rewrite-manifests", "rewrite-deletes",
      "rename-column", "drop-column", "widen-column")
  private def rowPreserving = RowPreservingOps

  def schemaFor(tableSchema: StructType): StructType =
    StructType(tableSchema.fields :+
      StructField(ChangeTypeCol, StringType, nullable = false) :+
      StructField(CommitCol, LongType, nullable = false))

  /** The changelog of `(fromSnapshotId, to]` as one DataFrame (commits
    * union'd; order by [[CommitCol]] to fold). `streamingTag` marks the
    * frame streaming for the DSv1 source (via a 0-row streaming-flagged
    * relation union'd in — the diff subplans themselves stay BATCH plans,
    * so their joins/aggregates never trip streaming-stateful planning). */
  def changes(
      table: GraftTable,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None,
      streamingTag: Boolean = false,
      pinned: Option[(StructType, Seq[PartitionSpec])] = None,
      updateImagesOn: Seq[String] = Seq.empty): DataFrame = {
    val spark = table.spark
    val md = table.metadata
    // a streaming source pins schema+specs at stream start (mid-stream
    // evolution must not change the micro-batch schema under a running
    // query); batch callers read the live metadata
    val (sch, specs) = pinned.getOrElse((table.schema, table.allPartitionSpecs))
    val to = toSnapshotId.orElse(md.currentSnapshotId).getOrElse(
      throw new IllegalArgumentException("changelog read on an empty table"))
    require(md.snapshot(fromSnapshotId).nonEmpty || fromSnapshotId == 0,
      s"unknown or expired snapshot $fromSnapshotId")

    def rel(files: Seq[DataFileMeta]): DataFrame =
      org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
        spark, sch, table.root, files, specs)
    def tag(df: DataFrame, kind: String, commitId: Long): DataFrame =
      df.withColumn(ChangeTypeCol, lit(kind)).withColumn(CommitCol, lit(commitId))

    // chain walk newest → oldest (same traversal as incrementalFiles)
    var cursor = md.snapshot(to).getOrElse(
      throw new IllegalArgumentException(s"unknown snapshot $to"))
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var done = false
    while (!done && cursor.id != fromSnapshotId) {
      val parent = cursor.parentId.flatMap(md.snapshot)
      frames ++= commitFrame(table, spark, sch, cursor, parent, rel, tag)
      cursor.parentId match {
        case Some(_) if parent.nonEmpty => cursor = parent.get
        case Some(pid) if pid == fromSnapshotId => done = true
        case None if fromSnapshotId == 0 => done = true
        case _ => throw new IllegalArgumentException(
          s"snapshot chain from $to to $fromSnapshotId broken " +
            "(expired snapshot, or a rollback onto another branch?)")
      }
    }

    // the commit diffs are BATCH subplans; update-image pairing adds a
    // Window which must also stay on the batch side (a Window over a
    // streaming-flagged child would be planned as an unsupported streaming
    // stateful operator) — so pair FIRST, then union in the 0-row
    // streaming-flagged relation that carries the isStreaming bit
    val batchEmpty = tag(rel(Seq.empty), "insert", 0L).filter(lit(false))
    val union = frames.foldLeft(batchEmpty)(_ unionByName _)
    val paired =
      if (updateImagesOn.isEmpty) union
      else withUpdateImages(union, updateImagesOn, sch)
    if (!streamingTag) paired
    else paired.unionByName(
      tag(org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
        spark, sch, table.root, Seq.empty, specs, isStreaming = true), "insert", 0L)
        .filter(lit(false)))
  }

  /**
   * Pair each commit's delete+insert events that share a key tuple into
   * `update_preimage` / `update_postimage` events (Delta-CDF-style): a key
   * that a commit both removed and re-added changed in place, and a consumer
   * that distinguishes updates from churn (e.g. a downstream index) needs
   * the pre/post images labeled as one logical update. Unpaired events keep
   * their insert/delete labels; the fold rule is unchanged (preimage folds
   * as delete, postimage as insert).
   *
   * One hash shuffle over the changelog rows on (commit, key) — cost scales
   * with the emitted changes, never the table. Key tuples are compared with
   * null-safe grouping semantics; with keys duplicated WITHIN one commit
   * (legal only for plain appends) every colliding event is relabeled, so
   * pair on a unique key (the MERGE key) as Delta requires.
   */
  def withUpdateImages(df: DataFrame, keyCols: Seq[String], sch: StructType): DataFrame = {
    require(keyCols.nonEmpty, "update-image pairing needs at least one key column")
    val missing = keyCols.filterNot(c => sch.fieldNames.contains(c))
    require(missing.isEmpty,
      s"update-image key columns not in table schema: ${missing.mkString(", ")}")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(
      (CommitCol +: keyCols).map(col): _*)
    val kinds = size(collect_set(col(ChangeTypeCol)).over(w))
    df.withColumn(ChangeTypeCol,
      when(kinds === 2 && col(ChangeTypeCol) === "delete", lit(UpdatePreimage))
        .when(kinds === 2 && col(ChangeTypeCol) === "insert", lit(UpdatePostimage))
        .otherwise(col(ChangeTypeCol)))
  }

  /** The full table contents at `snapshotId` as insert events — the
    * streaming source's initial-snapshot batch in change-rows mode. */
  def initialSnapshot(table: GraftTable, snapshotId: Long, streamingTag: Boolean,
      pinned: Option[(StructType, Seq[PartitionSpec])] = None,
      filesOverride: Option[Seq[DataFileMeta]] = None): DataFrame = {
    val spark = table.spark
    val (sch, specs) = pinned.getOrElse((table.schema, table.allPartitionSpecs))
    val files = filesOverride.getOrElse(table.files(Some(snapshotId)))
    val df = table.applyTombstones(
      table.withPositionDeletes(
        org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
          spark, sch, table.root, files, specs, isStreaming = streamingTag),
        files, Some(snapshotId)),
      Some(snapshotId))
    df.withColumn(ChangeTypeCol, lit("insert")).withColumn(CommitCol, lit(snapshotId))
  }

  /** Events of ONE commit (empty for row-preserving ops). */
  private def commitFrame(
      table: GraftTable,
      spark: SparkSession,
      sch: StructType,
      snap: Snapshot,
      parent: Option[Snapshot],
      rel: Seq[DataFileMeta] => DataFrame,
      tag: (DataFrame, String, Long) => DataFrame): Seq[DataFrame] = snap.operation match {

    case "append" | "publish" => // publish = branch cherry-pick: pure additions
      val parentM = parent.map(_.manifests.map(_.path).toSet).getOrElse(Set.empty)
      val files = snap.manifests.filterNot(m => parentM.contains(m.path))
        .flatMap(m => table.readManifest(m.path))
      if (files.isEmpty) Seq.empty
      else Seq(tag(table.applyTombstones(rel(files), Some(snap.id)), "insert", snap.id))

    case op if rowPreserving.contains(op) => Seq.empty // incl. materializing rewrites

    case "delete-mor" =>
      val parentDel = parent.map(_.deleteManifestList.map(_.path).toSet).getOrElse(Set.empty)
      val newDel = snap.deleteManifestList.filterNot(m => parentDel.contains(m.path))
        .flatMap(m => table.readManifest(m.path))
      if (newDel.isEmpty || parent.isEmpty) Seq.empty
      else {
        val keyDf = spark.read.parquet(newDel.map(table.absPath): _*).distinct()
        val keyCols = keyDf.columns.toSeq
        // file pruning by the key set's global per-column [min,max]: one
        // tiny aggregate over the tombstone keys, then the standard
        // min/max file prune — sound (wider bounds only admit more files)
        val parentFiles = table.files(Some(parent.get.id))
        val pruned = keyBoundsPredicate(spark, sch, keyDf, keyCols) match {
          case Some(p) => PredicatePrune.prune(sch, parentFiles, p, table.allPartitionSpecs)
          case None    => parentFiles
        }
        val vis = table.applyTombstones(rel(pruned), Some(parent.get.id))
        val right =
          if (newDel.map(_.rows).sum <= table.TombstoneBroadcastRowCap) broadcast(keyDf)
          else keyDf
        Seq(tag(vis.join(right, keyCols, "left_semi"), "delete", snap.id))
      }

    case "delete-pos" | "update-pos" | "merge-pos" =>
      // position-delete / MoR-update commit: the removed row images are the
      // rows at the NEWLY recorded (file, position) tuples. Positions were
      // computed on the parent-visible view (the writers apply live
      // tombstones + DVs first), so the semi-join is exactly the logical
      // delete set; the scan touches only the referenced files. An
      // update-pos commit additionally appended the updated images — those
      // files are pure additions and emit as inserts (update-image pairing
      // then labels matching keys as pre/post images).
      val parentPd = parent.map(_.posDeleteList.map(_.path).toSet).getOrElse(Set.empty)
      val newPd = snap.posDeleteList.filterNot(m => parentPd.contains(m.path))
        .flatMap(m => table.readManifest(m.path))
      val delFrames =
        if (newPd.isEmpty || parent.isEmpty) Seq.empty
        else Seq(tag(table.rowsAtPositions(sch,
          table.files(Some(parent.get.id)), newPd), "delete", snap.id))
      val parentM = parent.map(_.manifests.map(_.path).toSet).getOrElse(Set.empty)
      val addedFiles = snap.manifests.filterNot(m => parentM.contains(m.path))
        .flatMap(m => table.readManifest(m.path))
      val insFrames =
        if (addedFiles.isEmpty) Seq.empty
        else Seq(tag(table.applyTombstones(rel(addedFiles), Some(snap.id)), "insert", snap.id))
      delFrames ++ insFrames

    case _ => // copy-on-write file replacement: merge / update / delete / overwrite
      val parentManifests = parent.map(_.manifests).getOrElse(Seq.empty)
      val pm = parentManifests.map(_.path).toSet
      val cm = snap.manifests.map(_.path).toSet
      // shared manifests hold identical entries on both sides and cancel;
      // only manifests unique to one side need reading (replaceFiles keeps
      // untouched manifests as-is, so this is the commit's true footprint)
      val parentOnly = parentManifests.filterNot(m => cm.contains(m.path))
        .flatMap(m => table.readManifest(m.path))
      val childOnly = snap.manifests.filterNot(m => pm.contains(m.path))
        .flatMap(m => table.readManifest(m.path))
      val childPaths = childOnly.map(_.path).toSet
      val parentPaths = parentOnly.map(_.path).toSet
      val removed = parentOnly.filterNot(e => childPaths.contains(e.path))
      val added = childOnly.filterNot(e => parentPaths.contains(e.path))
      if (removed.isEmpty && added.isEmpty) Seq.empty
      else {
        // the rewrite read the removed files with the parent's position
        // deletes APPLIED, so the diff must too — otherwise rows whose
        // delete events were already emitted at their delete-pos commit
        // would re-surface here as spurious deletes. Added files are new
        // and can never be DV-referenced.
        val remRows = table.applyTombstones(
          table.withPositionDeletes(rel(removed), removed, parent.map(_.id)),
          parent.map(_.id))
        val addRows = table.applyTombstones(rel(added), Some(snap.id))
        val (delRows, insRows) = slimDiff(remRows, addRows, sch)
        Seq(tag(delRows, "delete", snap.id), tag(insRows, "insert", snap.id))
      }
  }

  private val Fp1 = "__cl_fp1"
  private val Fp2 = "__cl_fp2"

  /** Two independent 64-bit row fingerprints (128 bits total — collision
    * probability for a 10^9-distinct-row commit diff is ~3e-21). Null flags
    * are interleaved with the values because Spark's hash functions SKIP
    * null inputs (the running seed passes through unchanged), so without
    * them `(x, null)` and `(null, x)` would collide — and the skip applies
    * at EVERY nesting level (struct fields, array elements), where a flag
    * can't reach. Nested null-capable columns therefore hash their JSON
    * encoding instead (`ignoreNullFields=false`: null positions explicit,
    * field order schema-fixed, binary as base64 — deterministic within the
    * session, and fingerprints never outlive the one diff query). */
  private[table] def rowFingerprints(sch: StructType): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val parts = sch.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val canon = f.dataType match {
        case _: StructType | _: org.apache.spark.sql.types.ArrayType =>
          to_json(c, Map("ignoreNullFields" -> "false"))
        case _ => c
      }
      Seq(canon, isnull(c))
    }
    (xxhash64(parts: _*), xxhash64((lit(0x9E3779B97F4A7C15L) +: parts): _*))
  }

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: StructType => s.fields.exists(f => hasMapType(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMapType(a.elementType)
    case _ => false
  }

  /**
   * Multiset diff of two row sets — semantically `(rem exceptAll add,
   * add exceptAll rem)` — WITHOUT shuffling full row images. `exceptAll`
   * plans as a hash aggregate keyed on ALL columns, so diffing a web-page
   * commit shuffles the touched files' html/text payloads twice (multi-KB
   * grouping keys); at a 10 GB merge commit that is ~30 GB of shuffle for
   * a few thousand actual changes. Instead: aggregate per-side counts on a
   * 128-bit row fingerprint (slim shuffle: 16 bytes + count per distinct
   * row), keep fingerprints whose counts differ, and join the surviving
   * fingerprints back to one exemplar image per side (rows sharing a
   * fingerprint are identical images), replicated to the count delta —
   * full rows cross the wire only if they actually changed. Each side is
   * scanned twice (hash pass + image pass), same as the two `exceptAll`s.
   * Map-typed columns refuse loudly: Spark can neither hash a map (entry
   * order is not canonical) nor run set operations over one, so no row
   * diff exists for them in either plan shape.
   */
  private[table] def slimDiff(rem: DataFrame, add: DataFrame,
      sch: StructType): (DataFrame, DataFrame) = {
    sch.fields.find(f => hasMapType(f.dataType)).foreach(f =>
      throw new IllegalArgumentException(
        s"changelog row diff is unsupported for map-typed column '${f.name}': " +
          "Spark defines no canonical equality for MAP (no hash, no set ops) — " +
          "store sorted entries as array<struct<key,value>> instead"))
    // EVERY helper column name must be free, or the join/explode would
    // collide with a user column (silent corruption, not just an error)
    if (Seq(Fp1, Fp2, "_cl_n", "_cl_i", "_cl_t")
        .exists(sch.fieldNames.contains))
      return (rem.exceptAll(add), add.exceptAll(rem))
    val cols = sch.fieldNames.toSeq
    val (f1, f2) = rowFingerprints(sch)
    def hashed(df: DataFrame): DataFrame = df.withColumn(Fp1, f1).withColumn(Fp2, f2)
    // ONE aggregate over the side-tagged union replaces the previous
    // per-side count aggregates + full-outer join of the counted sets:
    // delta = Σtag = rem − add per fingerprint, with unchanged rows
    // cancelling right here — one fingerprint shuffle instead of two plus
    // a join exchange (guide §2.4: share the exchange). Uniqueness per
    // (fp1, fp2) is by construction of the groupBy, so the image join
    // below never multiplies.
    val tagged = hashed(rem).select(col(Fp1), col(Fp2), lit(1L).as("_cl_t"))
      .unionByName(hashed(add).select(col(Fp1), col(Fp2), lit(-1L).as("_cl_t")))
    val delta = tagged.groupBy(Fp1, Fp2).agg(sum(col("_cl_t")).as("_cl_n"))
      .filter(col("_cl_n") =!= 0L)
    // AQE broadcast-sizes the (small) delta side at runtime, so the image
    // scan joins without shuffling its full rows; dropDuplicates shuffles
    // only the matched (= changed) rows
    def images(side: DataFrame, want: org.apache.spark.sql.Column): DataFrame =
      hashed(side).join(delta.filter(want), Seq(Fp1, Fp2))
        .dropDuplicates(Fp1, Fp2)
        .withColumn("_cl_i", explode(sequence(lit(1L), abs(col("_cl_n")))))
        .select(cols.map(col): _*)
    (images(rem, col("_cl_n") > 0L), images(add, col("_cl_n") < 0L))
  }

  /** Conjunction of per-column [min,max] range predicates covering every
    * key tuple in `keyDf` — the sound file-prune for the delete-mor scan.
    * None when no key column's type supports bounds. */
  private def keyBoundsPredicate(
      spark: SparkSession,
      sch: StructType,
      keyDf: DataFrame,
      keyCols: Seq[String]): Option[org.apache.spark.sql.Column] = {
    val usable = keyCols.filter(c =>
      sch.fields.find(_.name == c).exists(f => Bounds.supported(f.dataType)))
    if (usable.isEmpty) return None
    val aggs = usable.flatMap(c => Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c")))
    val row = keyDf.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (row.anyNull) return None // empty key set or all-null keys: no prune
    val preds = usable.zipWithIndex.map { case (c, i) =>
      col(c) >= lit(row.get(2 * i)) && col(c) <= lit(row.get(2 * i + 1))
    }
    Some(preds.reduce(_ && _))
  }
}
