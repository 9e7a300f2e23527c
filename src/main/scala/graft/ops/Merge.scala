package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.run.{Lineage, Maintenance}
import graft.table.{Bounds, DataFileMeta, GraftTable, Snapshot}

/**
 * MERGE INTO with copy-on-write file replacement.
 *
 * Re-imagines the reference's incremental load: its per-row point re-scans
 * (`adapter/HBaseSourceTableAdapter.java:321-359` — a network round trip per
 * mutated row) become ONE set-based join of the change set against only the
 * files whose key range can contain a changed key; its generated
 * LEFT-OUTER-JOIN delete scripts (`hive/HiveTableIR.java:234-302`) become
 * the delete branch of the same join; its delete-marker semantics become an
 * explicit `_deleted` column on the source.
 *
 * Keys are COMPOSITE: `keyCols` may name any number of columns, matching the
 * reference's delete-merge which joins on every rowkey component
 * (`hive/HiveTableIR.java:311-315` builds `t.k1=s.k1 AND … AND t.kn=s.kn`).
 *
 * Semantics (latest-writer-wins, as HBase cell timestamps did):
 *  - source is first deduped to one row per key tuple (greatest warc_ts;
 *    delete beats upsert on ties) via a window — the reference's
 *    `Result.getColumnLatestCell` analog;
 *  - matched & newer & deleted  → row removed
 *  - matched & newer & !deleted → row replaced
 *  - matched & older            → target row kept (late-arriving change)
 *  - unmatched & !deleted       → insert
 *
 * Reserved source columns (all optional) refine the row images — the SQL
 * front door ([[graft.sql.GraftMergeRule]]) lowers column-level MERGE
 * actions onto them:
 *  - `_deleted` boolean: the row is a delete (see above);
 *  - `_noop` boolean: the row asserts PRESENCE only — its matched target
 *    row is kept unchanged (it is "matched by source" for the NOT MATCHED
 *    BY SOURCE clauses without any matched clause applying to it);
 *  - `_set_<col>`: column-level UPDATE image — when any `_set_*` column is
 *    present, a matched update replaces ONLY the assigned columns and keeps
 *    the target's values for the rest (ANSI `UPDATE SET c = expr`);
 *  - `_setw_<col>` boolean: per-row assignment mask for `_set_<col>` — when
 *    present, the update writes the column only where the mask is true and
 *    keeps the target value elsewhere. This is how MULTIPLE update clauses
 *    with different assigned column sets lower (first-match-wins: the row
 *    fired by clause A must keep target values for columns only clause B
 *    assigns — a NULL `_set_` value alone cannot distinguish "assign NULL"
 *    from "not assigned by the firing clause");
 *  - `_ins_<col>`: column-level INSERT image — when any `_ins_*` column is
 *    present, an insert takes the assigned columns and NULL for the rest
 *    (ANSI `INSERT (cols) VALUES (…)`);
 *  - `_insw_<col>` boolean: per-row assignment mask for `_ins_<col>`,
 *    symmetric to `_setw_<col>` (multiple insert clauses).
 *
 * Scale design: touched-file planning broadcasts only the per-file
 * [min,max] key intervals (tiny), maps each source key tuple to overlapping
 * files and collects just the distinct file ids; the join runs as a
 * Catalyst-planned sort-merge join (asserted in tests via the physical
 * plan); untouched files are carried into the new snapshot unchanged.
 */
object Merge {

  /** Canonical bound-string encoding of a key column, matching
    * [[graft.table.Bounds]] (timestamps → epoch micros, dates → epoch days,
    * numerics/strings verbatim) so interval comparisons against file stats
    * are in the same space. TIMESTAMP_NTZ keys assume a UTC session
    * timezone (all engine entry points set one) — the NTZ→TZ cast reads
    * wall time in the session zone, and file stats store raw micros. */
  private def canonicalKey(c: Column, dt: DataType): Column = dt match {
    case TimestampType    => unix_micros(c).cast("string")
    case TimestampNTZType => unix_micros(c.cast("timestamp")).cast("string")
    case DateType         => unix_date(c).cast("string")
    case _                => c.cast("string")
  }

  def touchedFiles(table: GraftTable, sourceKeys: DataFrame, keyCol: String): Seq[DataFileMeta] =
    touchedFiles(table, sourceKeys, Seq(keyCol))

  /** Files whose per-column [min,max] intervals may contain any source key
    * TUPLE: the leading key column drives an interval-stabbing index; the
    * remaining key columns filter its candidate window per row (a file
    * survives only if the SAME row fits its bounds on every key column). */
  def touchedFiles(table: GraftTable, sourceKeys: DataFrame, keyCols: Seq[String]): Seq[DataFileMeta] = {
    require(keyCols.nonEmpty, "at least one key column")
    val files = table.files()
    if (files.isEmpty) return Seq.empty
    val schema = table.schema
    val dts = keyCols.map { k =>
      schema.fields.find(_.name == k).map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(s"no column $k"))
    }
    dts.foreach(dt => require(Bounds.supported(dt), s"unsupported key type $dt"))
    // canonicalKey (and the range steering built on it) reads NTZ wall time
    // through the SESSION zone while file stats store raw NTZ micros — the
    // two agree only under UTC. Every engine entry point sets UTC; a
    // caller-supplied session must fail loudly here, not plan touched
    // files 2h off and silently duplicate merged keys.
    if (dts.contains(TimestampNTZType)) {
      val zone = table.spark.sessionState.conf.sessionLocalTimeZone
      // equivalence, not string equality: "Etc/UTC", "GMT", "+00:00" all
      // resolve to the zero offset and were always correct
      val isUtc = scala.util.Try(
        java.time.ZoneId.of(zone).normalized() == java.time.ZoneOffset.UTC).getOrElse(false)
      require(isUtc,
        s"TIMESTAMP_NTZ merge keys require spark.sql.session.timeZone=UTC " +
          s"(session is '$zone'): file statistics store raw NTZ micros and " +
          "key planning must match them")
    }
    val lead = keyCols.head
    val leadDt = dts.head
    // conservative: a file without bounds for the leading key is always touched
    val unbounded = files.filter(f => f.minValues.get(lead).isEmpty || f.maxValues.get(lead).isEmpty)
    val bounded = files.filter(f => f.minValues.contains(lead) && f.maxValues.contains(lead))
    if (bounded.isEmpty) return files
    // interval-stabbing index (sorted mins + prefix-max of maxes): O(log
    // files + overlaps) per key instead of a linear scan of every file —
    // the index itself is file-count-bounded and broadcast once
    val index = new IntervalIndex(leadDt,
      bounded.zipWithIndex.map { case (f, i) => (f.minValues(lead), f.maxValues(lead), i) })
    // residual key columns: per-file bounds arrays (null = no bounds = keep)
    val resCols = keyCols.tail
    val resDts = dts.tail
    val resMin: Array[Array[String]] = resCols.map(c => bounded.map(_.minValues.get(c).orNull).toArray).toArray
    val resMax: Array[Array[String]] = resCols.map(c => bounded.map(_.maxValues.get(c).orNull).toArray).toArray
    // bucket-dir pruning: a key tuple can only touch a file whose bucket dir
    // (when the file has one — -1 otherwise) matches the key's own bucket
    // under that spec. For a bucketed table this cuts the candidate set ~n×
    // beyond interval stabbing: buckets hold hash-sampled keys, so every
    // sorted run's [min,max] admits ~one candidate file PER BUCKET while the
    // dir pins the single bucket that can actually hold the key. The key's
    // bucket is computed by the same `pmod(hash(col), n)` expression writers
    // lay files out by (cast to the table's column type first), so both
    // sides share Spark's own murmur3 exactly. Applies across spec
    // generations: each file answers only for dirs it physically has.
    val bucketSpecs = table.allPartitionSpecs.filter(sp =>
      sp.transform == "bucket" && keyCols.contains(sp.sourceColumn))
    val fileBuckets: Array[Array[Int]] = bucketSpecs.map(sp =>
      bounded.map(f => sp.dirValue(f.path)
        .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(-1)).toArray).toArray
    val spark = table.spark
    val bcIdx = spark.sparkContext.broadcast(index)
    val bcRes = spark.sparkContext.broadcast((resDts.toArray, resMin, resMax))
    val bcBuckets = spark.sparkContext.broadcast(fileBuckets)
    val overlap = udf { (r: org.apache.spark.sql.Row) =>
      if (r.isNullAt(0)) Seq.empty[Int]
      else {
        val (rdts, rmin, rmax) = bcRes.value
        val fb = bcBuckets.value
        val bOff = 1 + rdts.length
        bcIdx.value.overlapping(r.getString(0)).filter { fid =>
          var ok = true
          var j = 0
          while (ok && j < rdts.length) {
            if (!r.isNullAt(j + 1)) {
              val v = r.getString(j + 1)
              val lo = rmin(j)(fid); val hi = rmax(j)(fid)
              if (lo != null && Bounds.compare(rdts(j), v, lo) < 0) ok = false
              else if (hi != null && Bounds.compare(rdts(j), v, hi) > 0) ok = false
            }
            j += 1
          }
          var s = 0
          while (ok && s < fb.length) {
            val b = fb(s)(fid)
            if (b >= 0 && !r.isNullAt(bOff + s) && r.getInt(bOff + s) != b) ok = false
            s += 1
          }
          ok
        }
      }
    }
    val keyStruct = struct(
      keyCols.zip(dts).map { case (k, dt) => canonicalKey(col(k), dt) } ++
        bucketSpecs.map { sp =>
          val dt = schema.fields.find(_.name == sp.sourceColumn).get.dataType
          pmod(hash(col(sp.sourceColumn).cast(dt)), lit(sp.param.get))
        }: _*)
    val touchedIds = sourceKeys
      .select(explode(overlap(keyStruct)).as("fid"))
      .distinct().collect().map(_.getInt(0)).toSet
    bounded.zipWithIndex.collect { case (f, i) if touchedIds.contains(i) => f } ++ unbounded
  }

  /** Single-key convenience overload. */
  def into(table: GraftTable, source: DataFrame, keyCol: String): Snapshot =
    into(table, source, Seq(keyCol))

  /** Touched-file target scan for the merge join. When the table is bucketed
    * on EXACTLY the merge key (single key column == the `bucket(n, col)`
    * transform's source, every touched file bucket-stamped — the table's
    * bucket gate), the relation reports `HashPartitioning(key, n)` and the
    * full-outer join shuffles ONLY the source side: the touched target bytes
    * — the dominant shuffle volume of a 100 TB merge — never move. The exact
    * single-key match is deliberate: with composite merge keys Spark's
    * co-partitioning rule (`requireAllClusterKeysForCoPartition`, default on)
    * shuffles both sides anyway, and an unhelpful bucketed scan would cap
    * scan parallelism at n for nothing. Everything else keeps the plain
    * parquet scan over the touched paths (size-split parallelism). Join
    * parallelism under the bucketed path is n — that is the user's declared
    * layout; per-task sort input is touchedBytes/n, so pick bucket counts
    * the way you'd pick shuffle partitions. */
  private[graft] def targetScan(table: GraftTable, schema: StructType,
      touched: Seq[graft.table.DataFileMeta], keyCols: Seq[String]): DataFrame = {
    val bs = table.bucketSpecFor(touched).filter { b =>
      keyCols.map(_.toLowerCase) == b.bucketColumnNames.map(_.toLowerCase)
    }
    if (bs.isDefined)
      org.apache.spark.sql.graftshim.GraftRelation.dataFrame(
        table.spark, schema, table.root, touched, table.allPartitionSpecs, bucketSpec = bs)
    else table.spark.read.schema(schema).parquet(touched.map(table.absPath): _*)
  }

  /**
   * Execute a merge of `source` (page-schema columns + optional reserved
   * columns, see class doc) into the table on `keyCols`. Returns the
   * committed snapshot.
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
      keyCols: Seq[String] = Seq("url"),
      versionCol: String = "warc_ts",
      targetFileBytes: Long = 128L * 1024 * 1024,
      runId: String = java.util.UUID.randomUUID.toString,
      latestWins: Boolean = true,
      notMatchedBySourceDelete: Option[Column] = None,
      notMatchedBySourceSet: Option[(Column, Map[String, Column])] = None,
      notMatchedBySourceDeleteFirst: Boolean = true,
      mode: String = "copy-on-write",
      propertyUpdates: Map[String, String] = Map.empty): Snapshot = {
    require(keyCols.nonEmpty, "at least one key column")
    // merge-on-read: changed target rows become deletion-vector entries and
    // updated/inserted images become a plain append — touched files are
    // NEVER rewritten, so a trickle upsert's write cost is the changed
    // rows, not the touched files (Iceberg's write.merge.mode). A later
    // delete-pressure compaction (or any rewrite) materializes the DVs.
    require(mode == "copy-on-write" || mode == "merge-on-read",
      s"unknown merge mode '$mode' (copy-on-write | merge-on-read)")
    val mor = mode == "merge-on-read"
    // NOT MATCHED BY SOURCE clauses act on TARGET rows without a source
    // match (ANSI); their condition/assignments evaluate on target columns.
    // They are ANSI-mode only — under latest-wins CDC semantics "absent
    // from this change batch" carries no meaning. BOTH actions may be
    // given (ANSI allows a conditional UPDATE and a conditional DELETE
    // together); `notMatchedBySourceDeleteFirst` fixes their first-match-
    // wins order.
    val nmbs = notMatchedBySourceDelete.nonEmpty || notMatchedBySourceSet.nonEmpty
    require(!nmbs || !latestWins,
      "NOT MATCHED BY SOURCE requires ANSI semantics (latestWins = false)")
    val spark = table.spark
    val t0 = System.nanoTime()
    var log = Maintenance.start(table, runId, "merge")
    // resume short-circuit FIRST: an already-committed merge must stay
    // idempotently re-runnable even if a MoR delete landed afterwards
    log.committedSnapshotId.foreach(id => return table.metadata.snapshot(id).get)
    require(table.tombstones().isEmpty,
      "table has live merge-on-read tombstones; materialize them first (Cluster.zorderRewrite) — equality deletes apply to future rows and would silently suppress merged keys")
    val snap = table.currentSnapshot
    // resume identity (same guard as Compact/Cluster): a crashed run's
    // rewrite output is only reusable against the snapshot it was planned
    // on — a concurrent commit in the crash window changes the touched set,
    // and silently pairing the OLD output with a NEW touched plan would
    // drop the concurrent rows at replaceFiles
    val planStep = s"plan@${snap.map(_.id).getOrElse(0L)}"
    require(log.doneSteps.isEmpty || log.doneSteps.contains(planStep),
      s"resume merge $runId: table advanced past the planned snapshot; start a fresh run")
    log = Maintenance.markDone(table, log, planStep)
    val schema = table.schema
    val cols = schema.fieldNames.toSeq
    keyCols.foreach(k => require(cols.contains(k), s"no key column $k in table schema"))

    val hasDeleted = source.columns.contains("_deleted")
    // column-level row images (see class doc): `_set_*` narrows the update
    // image to assigned columns, `_ins_*` narrows the insert image
    val setCols = source.columns.collect { case c if c.startsWith("_set_") => c.stripPrefix("_set_") }.toSet
    val insCols = source.columns.collect { case c if c.startsWith("_ins_") => c.stripPrefix("_ins_") }.toSet
    // per-row assignment masks (see class doc) — emitted when several
    // clauses assign different column sets
    val setwCols = source.columns.collect { case c if c.startsWith("_setw_") => c.stripPrefix("_setw_") }.toSet
    val inswCols = source.columns.collect { case c if c.startsWith("_insw_") => c.stripPrefix("_insw_") }.toSet
    require(setwCols.subsetOf(setCols) && inswCols.subsetOf(insCols),
      "mask columns (_setw_/_insw_) require matching _set_/_ins_ image columns")
    (setCols ++ insCols).foreach(c =>
      require(cols.contains(c), s"MERGE action assigns unknown column $c"))
    setCols.intersect(keyCols.toSet).headOption.foreach(c =>
      throw new IllegalArgumentException(
        s"MERGE UPDATE must not assign key column $c (rewrite the row via DELETE + INSERT)"))
    val src0 = if (hasDeleted) source else source.withColumn("_deleted", lit(false))
    val keyC = keyCols.map(col)
    val srcUncached =
      if (latestWins) {
        // latest change per key tuple: greatest version wins; delete beats
        // upsert on ties
        val w = Window.partitionBy(keyC: _*)
          .orderBy(col(versionCol).desc, col("_deleted").desc)
        src0.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      } else src0 // ANSI: cardinality is checked against MATCHED keys below
    // ONE materialization of the normalized source for ANSI merges:
    // touched-file planning, the ANSI cardinality check and the full-outer
    // rewrite join all consume it, and uncached each re-executed the whole
    // source plan — for the SQL door that plan embeds the touched-file
    // `_matched` join, so every SQL MERGE paid the lowering 3x. ANSI
    // sources are clause-filtered change sets (small by design), so one
    // MEMORY_AND_DISK materialization beats re-deriving them (released in
    // the finally below; sources the caller already persisted, e.g.
    // CdcApply's folded batch, are left alone).
    //
    // latest-wins merges deliberately DON'T cache: their source is
    // typically a raw scan-shaped change frame with full payload columns,
    // and caching it as deserialized rows costs more than the vectorized
    // re-scan it saves (measured in the 10 GB soak: merge task-seconds
    // 2.2x, wall +45% with the cache). Instead their planning pass scans
    // the PRE-dedup keys (below), so the version window runs ONCE — in
    // the join — and planning stays a column-pruned key scan.
    val srcOwnCache = !latestWins &&
      srcUncached.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val src =
      if (srcOwnCache) srcUncached.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else srcUncached
    try {

    val nmbsSetCols: Set[String] = notMatchedBySourceSet.map(_._2.keySet).getOrElse(Set.empty)
    nmbsSetCols.foreach(c => require(cols.contains(c), s"NOT MATCHED BY SOURCE assigns unknown column $c"))
    nmbsSetCols.intersect(keyCols.toSet).headOption.foreach(c =>
      throw new IllegalArgumentException(s"NOT MATCHED BY SOURCE must not assign key column $c"))

    val leadDt = schema.fields.find(_.name == keyCols.head).get.dataType
    // `_noop` rows join (their targets are "matched by source") but must
    // not WIDEN the rewrite: a file is only touched by keys some clause
    // fires for — untouched files keep their noop-matched rows by simply
    // not being rewritten
    // latest-wins planning scans the PRE-dedup source: the version window
    // keeps exactly one row per key tuple, so the key SET is identical,
    // and planning on src0 turns the planning pass into a column-pruned
    // key scan instead of a full execution of the dedup window (which
    // then runs exactly once, inside the rewrite join). Duplicate keys
    // are harmless to touchedFiles (it distincts file ids).
    val planSrc =
      if (latestWins) src0
      else if (src.columns.contains("_noop")) src.filter(!coalesce(col("_noop"), lit(false)))
      else src
    // ANSI duplicate-key probe launched CONCURRENTLY with touched-file
    // planning (guide §2.6 — overlap independent jobs): both consume only
    // the persisted source, so the probe's aggregate back-fills executor
    // slots behind the planning scan's tail instead of running as a second
    // sequential pass. Await sits at the original check site below.
    val dupsCountF: Option[scala.concurrent.Future[Long]] =
      if (latestWins) None
      else {
        val noopFlag =
          if (src.columns.contains("_noop")) coalesce(col("_noop"), lit(false)) else lit(false)
        val dupsDf = src.groupBy(keyC: _*)
          .agg(count(lit(1)).as("_cnt"),
            sum(when(noopFlag, 0L).otherwise(1L)).as("_modifying"))
          .filter(col("_cnt") > 1 && col("_modifying") >= 1L)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        Some(scala.concurrent.Future(dupsDf.count()))
      }
    val keyTouched = touchedFiles(table, planSrc.select(keyC: _*), keyCols)
    // NOT MATCHED BY SOURCE widens the rewrite to every file that may hold
    // a row its condition matches (the whole table when unconditional —
    // inherent to the semantics); the condition prunes via file stats
    val touched =
      if (!nmbs) keyTouched
      else {
        val cond = (notMatchedBySourceDelete.toSeq ++ notMatchedBySourceSet.map(_._1)).reduce(_ || _)
        (keyTouched ++ table.planFiles(Some(cond))).groupBy(_.path).map(_._2.head).toSeq
      }
    // bucket-on-key merge: the touched files scan bucketed (HashPartitioning
    // on the key — only the source side of the join shuffles) AND the join
    // output is physically bucket-co-partitioned, so the output rewrite
    // skips its range exchange too (see the `out` construction below)
    val bucketedN: Option[Int] =
      if (touched.isEmpty) None
      else table.bucketSpecFor(touched)
        .filter(b => keyCols.map(_.toLowerCase) == b.bucketColumnNames.map(_.toLowerCase))
        .map(_.numBuckets)
    val bucketedOnKey = bucketedN.isDefined
    val baseRaw =
      if (touched.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else targetScan(table, schema, touched, keyCols)
    // position deletes applied: a DV-deleted target row is NOT MATCHED
    // (the source row inserts); replaceFiles clears the touched files' DVs.
    // MoR mode additionally carries each surviving row's (file, position)
    // so changed rows can be recorded as new DV entries
    val base =
      if (!mor) {
        if (touched.isEmpty) baseRaw else table.withPositionDeletes(baseRaw, touched)
      } else if (touched.isEmpty)
        baseRaw.withColumn("_gdv_rel", lit(null).cast(StringType))
          .withColumn("_gdv_idx", lit(null).cast(LongType))
      else table.withPositionDeletesKeepingPos(baseRaw, touched)

    if (!latestWins) {
      // ANSI MERGE: an error when a TARGET row is matched by more than one
      // source row AND at least one of them would modify it (Delta's rule) —
      // multiple NOT MATCHED inserts of one key are legal (each inserts),
      // and keys whose duplicate rows are ALL `_noop` (presence-only,
      // nothing fires) must not error. A single firing row among noop
      // duplicates STILL errors: the full-outer join is per source row, so
      // letting it through would emit both the updated image and a kept
      // copy of the target. The zero-dup fast path costs ONE source
      // aggregate; the touched-file semi-join runs only when duplicate keys
      // exist at all. (A .limit(1).collect() would run the groupBy through
      // CollectLimit's sequential partition batches.)
      val noopFlag =
        if (src.columns.contains("_noop")) coalesce(col("_noop"), lit(false)) else lit(false)
      val dups = src.groupBy(keyC: _*)
        .agg(count(lit(1)).as("_cnt"),
          sum(when(noopFlag, 0L).otherwise(1L)).as("_modifying"))
        .filter(col("_cnt") > 1 && col("_modifying") >= 1L)
      val dupCount = dupsCountF.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
        .getOrElse(dups.count())
      if (dupCount > 0) {
        val offending = dups.select(keyC: _*).join(
          base.select(keyC: _*), keyCols, "left_semi")
        for (ex <- offending.limit(1).collect().headOption)
          throw new IllegalArgumentException(
            s"MERGE source has multiple rows for matched key '${ex.toSeq.mkString(",")}' " +
              s"(a target row must not be modified by more than one source row)")
      }
    }

    // NOT MATCHED BY SOURCE condition/assignments precompute on the TARGET
    // side BEFORE the join (only target columns are in scope — no
    // ambiguity with same-named source columns is possible)
    val baseAug = {
      var b = base
      // first-match-wins when BOTH actions exist: the later clause only
      // fires where the earlier one did not
      val delRaw = notMatchedBySourceDelete.map(c => coalesce(c.cast("boolean"), lit(false)))
      val updRaw = notMatchedBySourceSet.map { case (c, _) => coalesce(c.cast("boolean"), lit(false)) }
      val (delFires, updFires) = (delRaw, updRaw) match {
        case (Some(d), Some(u)) =>
          if (notMatchedBySourceDeleteFirst) (Some(d), Some(u && !d)) else (Some(d && !u), Some(u))
        case other => other
      }
      for (d <- delFires) b = b.withColumn("_nmbs_del", d)
      for (u <- updFires; (_, set) <- notMatchedBySourceSet) {
        b = b.withColumn("_nmbs_upd", u)
        // values evaluate only where the clause condition holds (lazy If
        // branches): an ANSI-throwing assignment must not abort the merge
        // via rows the clause never applies to
        for ((name, v) <- set) b = b.withColumn(s"_tset_$name", when(col("_nmbs_upd"), v))
      }
      b
    }

    // explicit presence markers: with composite keys (or nullable key
    // columns) "which side is absent" must not be inferred from key nullness
    val t = baseAug.withColumn("_t_present", lit(true)).alias("t")
    // duplicate ALL-noop keys collapse to one presence assertion: the
    // full-outer join emits one row per (target, source-row) PAIR, so a key
    // asserted present twice would otherwise duplicate its kept target row
    // in the rewrite output (keys where any duplicate MODIFIES errored
    // above; latestWins dedups by version window instead)
    val srcJ =
      if (!latestWins && src.columns.contains("_noop")) {
        val noopC = coalesce(col("_noop"), lit(false))
        src.filter(!noopC).unionByName(src.filter(noopC).dropDuplicates(keyCols))
      } else src
    val s = srcJ.withColumn("_s_present", lit(true)).alias("s")
    val joinCond = keyCols.map(k => t(k) === s(k)).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")
    val sP = coalesce(s("_s_present"), lit(false))
    val tP = coalesce(t("_t_present"), lit(false))
    val del = coalesce(s("_deleted"), lit(false))
    val noop =
      if (source.columns.contains("_noop")) coalesce(s("_noop"), lit(false)) else lit(false)
    val applies =
      if (latestWins) sP && tP && s(versionCol) >= t(versionCol)
      else sP && tP
    // unmatched target rows: kept, unless a NOT MATCHED BY SOURCE DELETE fires
    val keepUnmatchedTarget =
      notMatchedBySourceDelete.map(_ => !t("_nmbs_del")).getOrElse(lit(true))
    val keep = when(!sP, keepUnmatchedTarget)
      .when(applies && del, lit(false)) // newest change is a delete
      .when(!tP && del, lit(false)) // delete for an absent key: no-op
      .when(!tP && noop, lit(false)) // presence assertion for an absent key
      .otherwise(lit(true))
    // a source may legitimately omit schema columns it never writes (e.g. a
    // column-level UPDATE with no INSERT clause): full-row images read
    // missing source columns as typed NULLs — the branches referencing them
    // are unreachable for such sources, but Catalyst resolves them anyway.
    // Membership follows the session resolver (case-insensitive by default),
    // like the column resolution s(c) itself performs.
    val resolver = spark.sessionState.analyzer.resolver
    val srcCols = src.columns.toSeq
    def sOr(c: String, dt: org.apache.spark.sql.types.DataType): Column =
      if (srcCols.exists(resolver(_, c))) s(c) else lit(null).cast(dt)
    val imageCols: Seq[Column] = schema.fields.toSeq.map { f =>
        val c = f.name
        val updImage = if (setCols.isEmpty) sOr(c, f.dataType)
          else if (setCols.contains(c)) {
            val v = s(s"_set_$c").cast(f.dataType)
            // per-row mask: the firing clause may not assign this column
            if (setwCols.contains(c))
              when(coalesce(s(s"_setw_$c"), lit(false)), v).otherwise(t(c))
            else v
          } else t(c)
        val insImage = if (insCols.isEmpty) sOr(c, f.dataType)
          else if (insCols.contains(c)) {
            val v = s(s"_ins_$c").cast(f.dataType)
            if (inswCols.contains(c))
              when(coalesce(s(s"_insw_$c"), lit(false)), v) // else NULL
            else v
          } else if (keyCols.contains(c)) s(c) // key columns always carry over
          else lit(null).cast(f.dataType)
        val withMain = when(applies && !del && !noop, updImage)
          .when(!tP && sP, insImage) // insert (del rows were filtered above)
        (if (nmbsSetCols.contains(c))
          withMain.when(!sP && t("_nmbs_upd"), t(s"_tset_$c").cast(f.dataType))
        else withMain)
          .otherwise(t(c)).as(c)
      }

    val totalBytes = math.max(touched.map(_.bytes).sum, 1L)
    // Size the JOIN shuffle by DATA, not the session's partition default:
    // the full-outer SMJ sorts each shuffle partition, and with the default
    // partition count a 10 GB merge puts ~300 MB per sort task — at high
    // local concurrency every task shares one heap, the sorts turn
    // multi-pass external and task time inflates several-fold (measured in
    // the 10× soak: local[32] merge task-seconds ~6x local[8]'s). Raising
    // AQE's initialPartitionNum caps per-task sort input near 64 MB while
    // AQE coalesces small post-shuffle partitions back — plan-time only,
    // SCOPED to the rewrite action (restored afterwards so a 100 GB merge
    // doesn't leave every later query on the session planning thousands of
    // initial partitions), a no-op when AQE is off.
    val aqeInitKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    def withScopedConf[T](key: String, value: String)(body: => T): T = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    def withJoinShuffleSizedByData[T](body: => T): T = {
      val conf = spark.sessionState.conf
      bucketedN match {
        case Some(n) =>
          // Bucket-on-key merge: the join's parallelism IS the bucket count.
          // A default shuffle parallelism ABOVE n makes EnsureRequirements
          // shuffle BOTH sides "for parallelism" instead of reusing the
          // bucketed scan's partitioning — observed in the 10 GB soak (the
          // data-sized initialPartitionNum bump below pushed the default to
          // 150 > 64 buckets: 10 GB of shuffle where ~0.1 GB was expected).
          // Pin the rewrite's default AT n so the planner reuses the layout;
          // per-task sort input is touchedBytes/n by construction — pick
          // bucket counts the way you'd pick shuffle partitions.
          withScopedConf("spark.sql.shuffle.partitions",
              math.min(conf.numShufflePartitions, n).toString) {
            if (conf.adaptiveExecutionEnabled && conf.coalesceShufflePartitionsEnabled)
              withScopedConf(aqeInitKey, n.toString)(body)
            else body
          }
        case None =>
          if (!(conf.adaptiveExecutionEnabled && conf.coalesceShufflePartitionsEnabled)) body
          else {
            val want = math.ceil(totalBytes.toDouble / (64L << 20)).toInt
            val cur = spark.conf.getOption(aqeInitKey).map(_.toInt)
              .getOrElse(conf.numShufflePartitions)
            if (want <= cur) body
            else withScopedConf(aqeInitKey, want.toString)(body)
          }
      }
    }

    // the MoR branch runs the SAME full-outer SMJ, so it needs the same
    // data-sized shuffle (the CLAUDE.md sort-heavy-op rule): without it a
    // 10 GB MoR merge sorts ~300 MB per task at session-default partitions
    if (mor)
      return withJoinShuffleSizedByData {
        mergeOnRead(table, joined, imageCols, keyCols, runId, log, snap, touched,
          sP, tP, del, noop, applies,
          nmbsDel = if (notMatchedBySourceDelete.nonEmpty) coalesce(t("_nmbs_del"), lit(false)) else lit(false),
          nmbsUpd = if (notMatchedBySourceSet.nonEmpty) coalesce(t("_nmbs_upd"), lit(false)) else lit(false),
          posRel = t("_gdv_rel"), posIdx = t("_gdv_idx"), t0 = t0,
          propertyUpdates = propertyUpdates)
      }

    val merged = joined
      .filter(keep)
      .select(imageCols: _*)

    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val commitUuid = s"merge-$runId"
    val dir = s"${table.dataDir}/$commitUuid"
    if (!(log.doneSteps.contains("rewrite") && graft.table.FileIO.exists(s"$dir/_SUCCESS"))) withJoinShuffleSizedByData {
      graft.table.FileIO.deleteRecursively(dir)
      spark.sparkContext.setJobDescription(s"merge $runId (${touched.size} touched files)")
      // range-partition the merged output on the leading key WITHOUT sampling
      // the child (repartitionByRange would re-execute the full-outer join
      // just to pick boundaries): equi-depth boundaries come from the touched
      // files' key bounds weighted by row counts — free, from metadata.
      // EVERY supported key type maps into an order-preserving Long space
      // matching its canonical bound encoding (strings → 8-byte packed
      // prefix, timestamps → epoch micros, dates → epoch days, integrals
      // verbatim), so post-merge files carry TIGHT per-file key bounds and
      // the NEXT merge's touchedFiles interval index prunes — a hash
      // scatter would leave every output file spanning the whole key space
      // (type table + shared-prefix strip live in OrderedEncoding — the
      // same embedding generic Z-order clustering range-scales by, so one
      // bit-identity contract covers every range-layout pass)
      val steer: Option[(Column, String => Long)] = {
        // an 8-char pack cannot see past a long SHARED prefix — web URLs
        // all start "https://…", which pinned every packed key to one
        // value and collapsed a 10 GB merge output into ONE file (found
        // by the 10× soak). Strip the touched files' common bound prefix
        // before packing, on both the row side and the metadata side
        // (bounds are prefix-truncated, so their lcp is a prefix of every
        // key's — sound). Keys outside the prefix (new inserts) only
        // loosen bounds, never correctness.
        val lcpLen = leadDt match {
          case StringType =>
            val boundStrs = touched.flatMap(f =>
              f.minValues.get(keyCols.head) ++ f.maxValues.get(keyCols.head))
            if (boundStrs.isEmpty) 0
            else boundStrs.reduce(graft.functions.OrderedEncoding.lcp(_, _)).length
          case _ => 0
        }
        // binary, nested: no Long-sized encoding — forType returns None and
        // the merge output hash-scatters instead (wide decimals p <= 38
        // steer via the monotone nearest-double embedding since r6).
        // BooleanType is encodable but its 2-value key space degenerates
        // equi-depth boundaries to <=2 populated partitions — a
        // boolean-leading merge would funnel its whole sort through 1-2
        // tasks; hash scatter keeps the rewrite parallel (range bounds on
        // a 2-value lead key carry no pruning power anyway)
        leadDt match {
          case BooleanType => None
          case _ => graft.functions.OrderedEncoding.forType(leadDt, col(keyCols.head), lcpLen)
        }
      }
      val bds = steer.map { case (_, enc) =>
        RangeShuffle.boundariesFromFileMeta(touched, keyCols.head, nOut, enc)
      }
      val out =
        if (nOut <= 1) merged
        // bucket-on-key table: every output row's final key equals the side
        // it joined from (image key = coalesce(t.key, s.key)), and both join
        // inputs are HashPartitioning(key, n) — target via the bucketed scan,
        // source shuffled to match — so each join partition IS one bucket.
        // Catalyst reports UnknownPartitioning for a full-outer join (the
        // per-side key attributes null-extend), but the PHYSICAL placement
        // is exact, so the range exchange is pure waste here: writing the
        // join output directly gives one partitionBy dir per task, and the
        // in-partition sort + record rolling below still produce key-ordered
        // files with tight per-file bounds WITHIN each bucket (what the next
        // merge's interval index stabs). Net shuffle of a bucketed merge:
        // the source rows, nothing else.
        else if (bucketedOnKey) merged
        else (steer, bds) match {
          // missing/collapsed boundaries (no bounds, or a keyspace the
          // packed encoding cannot discriminate): range steering would
          // write a handful of oversized files — scatter instead
          case (Some((kc, _)), Some(b)) if b.length >= math.max(1, nOut / 4) =>
            RangeShuffle.byRange(merged, kc, b)
          case _ => merged.repartition(nOut, keyC: _*)
        }
      // in-partition sort + record rolling (the compact/cluster recipe):
      // when a Z-ordered table leaves the metadata boundaries too coarse
      // to cut nOut ranges (every touched file spans the whole key space),
      // each steered partition still splits into right-sized files, and
      // the sort makes every rolled file a key-ordered run with TIGHT
      // min/max bounds — what the NEXT merge's interval index prunes by.
      // Rolling is sized from the TOUCHED rows and only engages when the
      // rewrite wants several files: an insert-only merge has zero touched
      // rows (nOut = 1) and an unconditional roll of max(1, 0/1) = 1 would
      // write one parquet file PER ROW
      val touchedRows = touched.map(_.rows).sum
      val rollRecords = if (nOut <= 1 || touchedRows == 0) 0L
        else math.max(1L, touchedRows / nOut)
      val rewriteFrame = out.sortWithinPartitions(keyC: _*)
      // diagnostic plan artifact (optimization evidence; off by default)
      sys.env.get("SPARK_GRAFT_EXPLAIN_DIR").foreach { d =>
        scala.util.Try {
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$d/merge_rewrite.txt"),
            rewriteFrame.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
        }
      }
      table.writeDataFiles(rewriteFrame, commitUuid,
        maxRecordsPerFile = rollRecords)
      Maintenance.markDone(table, log, "rewrite")
    }
    // drop all-empty outputs (an empty range partition writes a 0-row file
    // with no stats — pure planning overhead in the manifest)
    val added = graft.table.StatsCollector.collect(
      spark, schema, table.root, graft.table.FileIO.listFilesRecursively(dir, ".parquet"), commitUuid)
      .filter(_.rows > 0)
    val committed = table.replaceFiles(touched.map(_.path).toSet, added, "merge",
      Map("run-id" -> runId, "touched-files" -> touched.size.toString),
      expectedSnapshotId = snap.map(_.id),
      propertyUpdates = propertyUpdates)
    Maintenance.markCommitted(table, log, committed.id)
    Lineage.record(spark, table, runId, committed.id, "merge", added,
      added.map(o => o.path -> touched).toMap, (System.nanoTime() - t0) / 1000000)
    committed
    } finally {
      // release the one-merge source cache and the job label (a stale
      // description would mislabel every later job in the session's UI)
      if (srcOwnCache) { src.unpersist(); () }
      spark.sparkContext.setJobDescription(null)
    }
  }

  /**
   * Merge-on-read output assembly (Iceberg's `write.merge.mode =
   * merge-on-read`): changed target rows' (file, position) tuples become a
   * deletion-vector file and the updated/inserted images a plain append —
   * ONE `merge-pos` commit, no touched file rewritten. The join and image
   * projection are EXACTLY the copy-on-write path's (same clause matrix,
   * same semantics); only the output shape differs, so a trickle upsert on
   * a 100 TB table writes the changed rows, not the touched files. A later
   * delete-pressure compaction (or any rewrite) materializes the DVs.
   */
  private def mergeOnRead(
      table: GraftTable,
      joined: DataFrame,
      imageCols: Seq[Column],
      keyCols: Seq[String],
      runId: String,
      log: graft.table.StepLog,
      snap: Option[Snapshot],
      touched: Seq[DataFileMeta],
      sP: Column, tP: Column, del: Column, noop: Column, applies: Column,
      nmbsDel: Column, nmbsUpd: Column,
      posRel: Column, posIdx: Column, t0: Long,
      propertyUpdates: Map[String, String] = Map.empty): Snapshot = {
    val spark = table.spark
    val matchedFires = applies && !noop
    // a target row leaves its file iff a matched clause fires for it (update
    // OR delete) or a NOT MATCHED BY SOURCE action hits it; an image is
    // appended for updates and inserts (deletes only produce the DV entry)
    val dvRow = tP && (matchedFires || (!sP && (nmbsDel || nmbsUpd)))
    val writeRow = (matchedFires && !del) || (!tP && sP && !del && !noop) || (!sP && nmbsUpd)
    val changed = joined.filter(dvRow || writeRow)
      .select(imageCols ++ Seq(posRel.as("_gdv_rel"), posIdx.as("_gdv_idx"),
        dvRow.as("_dv"), writeRow.as("_wr")): _*)
    // ONE join execution feeds both outputs: the changed set is the MoR
    // niche (small relative to touched bytes), so persisting it is the
    // cheap side of re-running the full-outer join twice
    changed.persist()
    try {
      val dvUuid = s"dvm-$runId"
      val dvDir = s"${table.dataDir}/$dvUuid"
      graft.table.FileIO.deleteRecursively(dvDir) // crashed earlier attempt
      changed.filter(col("_dv"))
        .select(col("_gdv_rel").as("_file"), col("_gdv_idx").as("_pos"))
        .sortWithinPartitions("_file", "_pos")
        .write.mode("errorifexists").parquet(dvDir)
      val dvMetas = graft.table.StatsCollector.collect(
        spark, table.PosDeleteSchema, table.root,
        graft.table.FileIO.listFiles(dvDir, ".parquet"), dvUuid)
        .filter(_.rows > 0)
      val outUuid = s"merge-$runId"
      graft.table.FileIO.deleteRecursively(s"${table.dataDir}/$outUuid")
      val outCols = table.schema.fieldNames.toSeq
      // appended images sort by key within each task: new files carry tight
      // key bounds for the NEXT merge's touchedFiles pruning
      val added = table.writeDataFiles(
        changed.filter(col("_wr")).select(outCols.map(col): _*)
          .sortWithinPartitions(keyCols.map(col): _*),
        outUuid).filter(_.rows > 0)
      if (dvMetas.isEmpty && added.isEmpty) {
        // no-op MoR merge (e.g. a delete-only batch over absent keys):
        // clean the unreferenced staging dirs, then COMMIT an empty
        // merge-pos snapshot — same externally-observable behavior as the
        // CoW path's empty commit, and markCommitted keeps the runId
        // idempotently re-runnable (a bare return would strand its StepLog)
        graft.table.FileIO.deleteRecursively(dvDir)
        graft.table.FileIO.deleteRecursively(s"${table.dataDir}/$outUuid")
      }
      val committed = table.commitFull("merge-pos", expectedSnapshotId = snap.map(_.id),
          propertyUpdates = propertyUpdates) { parent =>
        (parent.map(_.manifests).getOrElse(Seq.empty) ++
            (if (added.nonEmpty) Seq(table.writeManifest(added)) else Nil),
          parent.flatMap(_.deleteManifests),
          Some(parent.map(_.posDeleteList).getOrElse(Seq.empty) ++
            (if (dvMetas.nonEmpty) Seq(table.writeManifest(dvMetas)) else Nil)),
          Map("run-id" -> runId, "touched-files" -> touched.size.toString,
            "position-deletes-added" -> dvMetas.map(_.rows).sum.toString,
            "added-files" -> added.size.toString,
            "added-rows" -> added.map(_.rows).sum.toString))
      }
      Maintenance.markCommitted(table, log, committed.id)
      Lineage.record(spark, table, runId, committed.id, "merge-pos", added,
        added.map(o => o.path -> touched).toMap, (System.nanoTime() - t0) / 1000000)
      committed
    } finally changed.unpersist()
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
    val df = table.withPositionDeletes(
        spark.read.schema(schema).parquet(touched.map(table.absPath): _*), touched)
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
    val df = table.withPositionDeletes(
        spark.read.schema(schema).parquet(touched.map(table.absPath): _*), touched)
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

  /**
   * Predicate-scoped atomic overwrite (Delta's `replaceWhere`): one commit
   * that deletes every row matching `predicate` and inserts `data` — the
   * backfill primitive ("recompute one day of the corpus") the reference
   * ran as a full DROP/RENAME table swap (`hive/HiveTableIR.java:296-299`).
   *
   * Scale shape: only files whose stats/partition bounds INTERSECT the
   * predicate are touched (metadata prune, no scan to plan); their
   * non-matching rows are rewritten alongside the new data in one pass; all
   * other files are untouched manifest entries. On a day-partitioned 100 TB
   * table a one-day backfill reads and writes one day, not the table.
   *
   * `validate=true` (default, as Delta) refuses `data` rows that do NOT
   * match the predicate — a misplaced row would silently land outside the
   * region the caller believes they replaced. The full validation scan is
   * one parallel count over the incoming frame.
   *
   * Live tombstones carry forward: they apply to the new rows exactly as
   * they would to a plain append's (equality deletes have no sequence
   * numbers); replaced files simply stop mattering to them.
   */
  def replaceWhere(
      table: GraftTable,
      predicate: Column,
      data: DataFrame,
      runId: String = java.util.UUID.randomUUID.toString,
      validate: Boolean = true): Snapshot = {
    val spark = table.spark
    val t0 = System.nanoTime()
    val schema = table.schema
    val snap = table.currentSnapshot
    if (validate) {
      // full parallel count, not take(1): proving absence must scan it all
      // anyway, and CollectLimit's incremental partition batches would
      // serialize the scan (see Cluster's key-sample lesson)
      val bad = data.filter(!coalesce(predicate, lit(false))).count()
      require(bad == 0,
        s"replaceWhere: $bad incoming rows do not match the predicate " +
          s"($predicate) — they would land outside the replaced region; " +
          "fix the data or pass validate=false to keep them")
    }
    val touched = table.planFiles(Some(predicate))
    // project the incoming frame to the table schema ONCE — the empty-
    // touched branch must union the same shape as the read-back branch
    val aligned = data.select(schema.fieldNames.map(col): _*)
    val kept =
      if (touched.isEmpty) aligned.limit(0)
      else table.withPositionDeletes(
          spark.read.schema(schema).parquet(touched.map(table.absPath): _*), touched)
        .filter(!coalesce(predicate, lit(false)))
    val commitUuid = s"overwrite-$runId"
    val metas = table.writeDataFiles(kept.unionByName(aligned), commitUuid)
    val added = metas.filter(_.rows > 0)
    val committed = table.replaceFiles(touched.map(_.path).toSet, added, "overwrite",
      Map("run-id" -> runId, "predicate" -> predicate.toString),
      expectedSnapshotId = snap.map(_.id))
    Lineage.record(spark, table, runId, committed.id, "overwrite", added,
      added.map(o => o.path -> touched).toMap, (System.nanoTime() - t0) / 1000000)
    committed
  }
}
