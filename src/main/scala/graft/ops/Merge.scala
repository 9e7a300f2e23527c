package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.run.{Lineage, Maintenance}
import graft.table.{Bounds, DataFileMeta, GraftTable, Snapshot}

/**
 * MERGE INTO with copy-on-write file replacement.
 *
 * Re-imagines the reference's incremental load: its per-row point re-scans
 * (`adapter/HBaseSourceTableAdapter.java:321-359` — a network round trip per
 * mutated row) become ONE set-based join of the change set against only the
 * files whose url range can contain a changed key; its generated
 * LEFT-OUTER-JOIN delete scripts (`hive/HiveTableIR.java:234-302`) become
 * the delete branch of the same join; its delete-marker semantics become an
 * explicit `_deleted` column on the source.
 *
 * Semantics (latest-writer-wins, as HBase cell timestamps did):
 *  - source is first deduped to one row per url (greatest warc_ts; delete
 *    beats upsert on ties) via a window — the reference's
 *    `Result.getColumnLatestCell` analog;
 *  - matched & newer & deleted  → row removed
 *  - matched & newer & !deleted → row replaced
 *  - matched & older            → target row kept (late-arriving change)
 *  - unmatched & !deleted       → insert
 *
 * Scale design: touched-file planning broadcasts only the per-file
 * [min,max] url intervals (tiny), maps each source key to overlapping files
 * and collects just the distinct file ids; the join runs as a
 * Catalyst-planned sort-merge join (asserted in tests via the physical
 * plan); untouched files are carried into the new snapshot unchanged.
 */
object Merge {

  /** Files whose [min,max] url interval may contain any source key. */
  def touchedFiles(table: GraftTable, sourceKeys: DataFrame, keyCol: String): Seq[DataFileMeta] = {
    val files = table.files()
    if (files.isEmpty) return Seq.empty
    val dt = table.schema.fields.find(_.name == keyCol).map(_.dataType)
      .getOrElse(throw new IllegalArgumentException(s"no column $keyCol"))
    require(dt == StringType || Bounds.supported(dt), s"unsupported key type $dt")
    // conservative: a file without bounds for the key is always touched
    val unbounded = files.filter(f => f.minValues.get(keyCol).isEmpty || f.maxValues.get(keyCol).isEmpty)
    val bounded = files.filter(f => f.minValues.contains(keyCol) && f.maxValues.contains(keyCol))
    if (bounded.isEmpty) return files
    // interval-stabbing index (sorted mins + prefix-max of maxes): O(log
    // files + overlaps) per key instead of a linear scan of every file —
    // the index itself is file-count-bounded and broadcast once
    val index = new IntervalIndex(dt,
      bounded.zipWithIndex.map { case (f, i) => (f.minValues(keyCol), f.maxValues(keyCol), i) })
    val spark = table.spark
    val bc = spark.sparkContext.broadcast(index)
    val overlap = udf { (k: String) =>
      if (k == null) Seq.empty[Int] else bc.value.overlapping(k)
    }
    val touchedIds = sourceKeys
      .select(explode(overlap(col(keyCol).cast("string"))).as("fid"))
      .distinct().collect().map(_.getInt(0)).toSet
    bounded.zipWithIndex.collect { case (f, i) if touchedIds.contains(i) => f } ++ unbounded
  }

  /**
   * Execute a merge of `source` (page-schema columns + optional `_deleted`
   * boolean) into the table on `keyCol`. Returns the committed snapshot.
   *
   * `latestWins` = true (default) keeps the reference's HBase-cell
   * semantics: a source row older than the target row (by `versionCol`) is
   * a late-arriving change and loses. `latestWins` = false gives ANSI
   * MERGE semantics (matched source rows always apply) — the SQL surface
   * ([[graft.sql.GraftMergeRule]]) uses this.
   */
  def into(
      table: GraftTable,
      source: DataFrame,
      keyCol: String = "url",
      versionCol: String = "warc_ts",
      targetFileBytes: Long = 128L * 1024 * 1024,
      runId: String = java.util.UUID.randomUUID.toString,
      latestWins: Boolean = true): Snapshot = {
    val spark = table.spark
    val t0 = System.nanoTime()
    val log = Maintenance.start(table, runId, "merge")
    // resume short-circuit FIRST: an already-committed merge must stay
    // idempotently re-runnable even if a MoR delete landed afterwards
    log.committedSnapshotId.foreach(id => return table.metadata.snapshot(id).get)
    require(table.tombstones().isEmpty,
      "table has live merge-on-read tombstones; materialize them first (Cluster.zorderRewrite) — equality deletes apply to future rows and would silently suppress merged keys")
    val snap = table.currentSnapshot
    val schema = table.schema
    val cols = schema.fieldNames.toSeq

    val hasDeleted = source.columns.contains("_deleted")
    val src0 = if (hasDeleted) source else source.withColumn("_deleted", lit(false))
    val src =
      if (latestWins) {
        // latest change per key: greatest version wins; delete beats upsert on tie
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col(versionCol).desc, col("_deleted").desc)
        src0.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      } else {
        // ANSI MERGE: a target row matched by MORE THAN ONE source row is an
        // error, not an arbitrary pick — and no version column is needed
        val dup = src0.groupBy(col(keyCol)).count().filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"MERGE source has multiple rows for key '${dup.headOption.map(_.get(0)).orNull}' " +
            s"($keyCol must be unique in the source)")
        src0
      }

    val dt = schema.fields.find(_.name == keyCol).map(_.dataType)
      .getOrElse(throw new IllegalArgumentException(s"no column $keyCol"))
    val touched = touchedFiles(table, src.select(keyCol), keyCol)
    val base =
      if (touched.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(touched.map(table.absPath): _*)

    val t = base.alias("t")
    val s = src.alias("s")
    val joined = t.join(s, t(keyCol) === s(keyCol), "full_outer")
    val tKey = t(keyCol); val sKey = s(keyCol)
    val takeSource =
      if (latestWins) sKey.isNotNull && (tKey.isNull || s(versionCol) >= t(versionCol))
      else sKey.isNotNull
    val keep = when(sKey.isNull, lit(true)) // unmatched target row: kept
      .when(takeSource && s("_deleted"), lit(false)) // newest change is a delete
      .otherwise(!s("_deleted") || tKey.isNotNull) // insert, or keep older target
    val merged = joined
      .filter(keep)
      .select(cols.map { c =>
        when(takeSource && !s("_deleted"), s(c)).otherwise(t(c)).as(c)
      }: _*)

    val totalBytes = math.max(touched.map(_.bytes).sum, 1L)
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val commitUuid = s"merge-$runId"
    val dir = s"${table.dataDir}/$commitUuid"
    if (!(log.doneSteps.contains("rewrite") && graft.table.FileIO.exists(s"$dir/_SUCCESS"))) {
      graft.table.FileIO.deleteRecursively(dir)
      spark.sparkContext.setJobDescription(s"merge $runId (${touched.size} touched files)")
      // range-partition the merged output on the key WITHOUT sampling the
      // child (repartitionByRange would re-execute the full-outer join just
      // to pick boundaries): equi-depth boundaries come from the touched
      // files' key bounds weighted by row counts — free, from metadata
      val out =
        if (nOut > 1 && dt == StringType) {
          val bds = RangeShuffle.boundariesFromFileMeta(touched, keyCol, nOut,
            s => graft.functions.ZOrder.packPrefixScala(s))
          RangeShuffle.byRange(merged,
            graft.functions.ZOrder.packedPrefix(col(keyCol), 8), bds)
        } else if (nOut > 1) merged.repartition(nOut, col(keyCol))
        else merged
      table.writeDataFiles(out, commitUuid)
      Maintenance.markDone(table, log, "rewrite")
    }
    val added = graft.table.StatsCollector.collect(
      spark, schema, table.root, graft.table.FileIO.listFilesRecursively(dir, ".parquet"), commitUuid)
    val committed = table.replaceFiles(touched.map(_.path).toSet, added, "merge",
      Map("run-id" -> runId, "touched-files" -> touched.size.toString),
      expectedSnapshotId = snap.map(_.id))
    Maintenance.markCommitted(table, log, committed.id)
    Lineage.record(spark, table, runId, committed.id, "merge", added,
      added.map(o => o.path -> touched).toMap, (System.nanoTime() - t0) / 1000000)
    committed
  }

  /**
   * Copy-on-write UPDATE WHERE: rewrites only files that may contain
   * matching rows (metadata pruning), replacing the assigned columns where
   * the predicate holds. All assignments evaluate against the PRE-update
   * row (ANSI UPDATE semantics) — they run in one projection.
   */
  def updateWhere(
      table: GraftTable,
      predicate: Column,
      set: Map[String, Column],
      runId: String = java.util.UUID.randomUUID.toString): Snapshot = {
    val spark = table.spark
    val t0 = System.nanoTime()
    val schema = table.schema
    for (c <- set.keys)
      require(schema.fieldNames.contains(c), s"UPDATE of unknown column $c")
    require(table.tombstones().isEmpty,
      "table has live merge-on-read tombstones; materialize them first (Cluster.zorderRewrite)")
    val snap = table.currentSnapshot
    val touched = table.planFiles(Some(predicate))
    if (touched.isEmpty) return snap.getOrElse(throw new IllegalStateException("empty table"))
    val hit = coalesce(predicate, lit(false))
    val df = spark.read.schema(schema).parquet(touched.map(table.absPath): _*)
      .select(schema.fields.toSeq.map { f =>
        set.get(f.name) match {
          case Some(v) => when(hit, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None    => col(f.name)
        }
      }: _*)
    val commitUuid = s"update-$runId"
    val added = table.writeDataFiles(df, commitUuid)
    val committed = table.replaceFiles(touched.map(_.path).toSet, added, "update",
      Map("run-id" -> runId, "predicate" -> predicate.toString,
        "set-columns" -> set.keys.toSeq.sorted.mkString(",")),
      expectedSnapshotId = snap.map(_.id))
    Lineage.record(spark, table, runId, committed.id, "update", added,
      added.map(o => o.path -> touched).toMap, (System.nanoTime() - t0) / 1000000)
    committed
  }

  /**
   * Copy-on-write DELETE WHERE: rewrites only files that may contain
   * matching rows (metadata pruning), filtering them with the negated
   * predicate — the set-based form of the reference's regex-rowkey delete
   * scan (`adapter/HBaseTargetAdapter.java:124-196`).
   */
  def deleteWhere(
      table: GraftTable,
      predicate: Column,
      runId: String = java.util.UUID.randomUUID.toString): Snapshot = {
    val spark = table.spark
    val t0 = System.nanoTime()
    val schema = table.schema
    val snap = table.currentSnapshot
    val touched = table.planFiles(Some(predicate))
    if (touched.isEmpty) return snap.getOrElse(throw new IllegalStateException("empty table"))
    val df = spark.read.schema(schema).parquet(touched.map(table.absPath): _*)
      .filter(!coalesce(predicate, lit(false)))
    val commitUuid = s"delete-$runId"
    val metas = table.writeDataFiles(df, commitUuid)
    // drop all-empty outputs (predicate matched an entire file)
    val added = metas.filter(_.rows > 0)
    val committed = table.replaceFiles(touched.map(_.path).toSet, added, "delete",
      Map("run-id" -> runId, "predicate" -> predicate.toString),
      expectedSnapshotId = snap.map(_.id))
    Lineage.record(spark, table, runId, committed.id, "delete", added,
      added.map(o => o.path -> touched).toMap, (System.nanoTime() - t0) / 1000000)
    committed
  }
}
