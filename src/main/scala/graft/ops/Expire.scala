package graft.ops

import graft.table.{FileIO, GraftTable, Snapshot}

/**
 * Snapshot expiry with retained-snapshot GC: drops old snapshots from table
 * metadata, then deletes data files and manifests referenced ONLY by the
 * dropped snapshots — generalizing the reference's fixed 90-day incremental
 * lookback (`job/JobUtil.java:557-567`, constant 7776000000 ms) into a
 * retention policy over real snapshot history.
 *
 * Order of operations matters for snapshot isolation: metadata commits
 * first (readers can no longer pin an expired snapshot), physical deletes
 * happen after — a reader that already planned files from an old snapshot
 * before the commit races only with the GC of files that were exclusively
 * referenced by snapshots it should not have pinned.
 */
object Expire {

  final case class Result(
      removedSnapshots: Seq[Long],
      deletedDataFiles: Seq[String],
      deletedManifests: Seq[String])

  def expire(
      table: GraftTable,
      retainLast: Int = 1,
      olderThanMs: Long = Long.MaxValue): Result = {
    require(retainLast >= 1, "must retain at least the current snapshot")
    val md = table.metadata
    val current = md.currentSnapshotId.getOrElse(return Result(Nil, Nil, Nil))
    val byId = md.snapshots.sortBy(_.id)
    // named refs pin their snapshot — and thereby every file it references —
    // regardless of age or retainLast, until the ref is dropped. A BRANCH
    // additionally pins its staged chain head→base (exclusive): expiring an
    // intermediate staged commit would break the fast-forward ancestry walk
    // mid-staging. Main history below the base ages out normally.
    val branchChains = md.refMap.values.filter(_.kind == "branch").flatMap { r =>
      val chain = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = md.snapshot(r.snapshotId)
      while (cur.nonEmpty && !r.baseSnapshotId.contains(cur.get.id)) {
        chain += cur.get.id
        cur = cur.get.parentId.flatMap(md.snapshot)
      }
      chain
    }
    val keepIds = (byId.takeRight(retainLast).map(_.id) :+ current).toSet ++
      byId.filter(_.timestampMs >= olderThanMs).map(_.id) ++
      md.refMap.values.map(_.snapshotId) ++ branchChains
    val (kept, dropped) = byId.partition(s => keepIds.contains(s.id))
    if (dropped.isEmpty) return Result(Nil, Nil, Nil)

    // data AND merge-on-read tombstone manifests both pin their files
    def allManifests(s: Snapshot) = s.manifests ++ s.deleteManifestList
    val keptManifests = kept.flatMap(allManifests(_).map(_.path)).toSet
    val keptFiles = kept.flatMap(s => allManifests(s).flatMap(m => table.readManifest(m.path)))
      .map(_.path).toSet
    val droppedManifests = dropped.flatMap(allManifests(_).map(_.path)).distinct
      .filterNot(keptManifests.contains)
    val droppedFiles = dropped
      .flatMap(s => allManifests(s).flatMap(m => table.readManifest(m.path)))
      .map(_.path).distinct
      .filterNot(keptFiles.contains)

    table.commitMetadataUpdate(cur => cur.copy(snapshots = cur.snapshots.filter(s => keepIds.contains(s.id))))

    droppedFiles.foreach(p => FileIO.delete(s"${table.root}/$p"))
    droppedManifests.foreach(p => FileIO.delete(s"${table.root}/$p"))
    Result(dropped.map(_.id), droppedFiles, droppedManifests)
  }

  /**
   * Remove orphan data files: files on disk under `data/` referenced by NO
   * snapshot — leftovers of crashed maintenance runs that staged output but
   * never committed. Only files older than `olderThanMs` are touched, so an
   * IN-FLIGHT run's staging is never deleted (the same grace window
   * real-world orphan cleanup uses against racing writers).
   */
  def removeOrphans(table: GraftTable, olderThanMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val referenced: Set[String] = table.metadata.snapshots
      .flatMap(s => (s.manifests ++ s.deleteManifestList).flatMap(m => table.readManifest(m.path)))
      .map(f => s"${table.root}/${f.path}").toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val orphans = scala.collection.mutable.ArrayBuffer.empty[String]
    val dataRoot = java.nio.file.Paths.get(table.dataDir)
    if (java.nio.file.Files.isDirectory(dataRoot)) {
      val stream = java.nio.file.Files.walk(dataRoot)
      try {
        stream.forEach { p =>
          if (java.nio.file.Files.isRegularFile(p)) {
            val abs = p.toString
            val isData = abs.endsWith(".parquet")
            if (isData && !referenced.contains(abs) &&
                java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff) {
              orphans += abs
            }
          }
        }
      } finally stream.close()
    }
    orphans.foreach(FileIO.delete)
    // prune now-empty commit directories
    FileIO.listFiles(table.dataDir) // no-op touch; directories cleaned below
    val dirStream = java.nio.file.Files.list(dataRoot)
    try {
      dirStream.forEach { d =>
        if (java.nio.file.Files.isDirectory(d)) {
          val ls = java.nio.file.Files.list(d)
          val empty = try !ls.findFirst().isPresent finally ls.close()
          if (empty) java.nio.file.Files.deleteIfExists(d)
        }
      }
    } finally dirStream.close()
    orphans.toSeq
  }
}

/**
 * Manifest rewrite: many small manifests (one per commit) → few right-sized
 * ones, so scan planning stays O(files) with small constant factors even
 * after thousands of commits. The data-file set is unchanged — asserted by
 * the commit summary.
 */
object ManifestRewrite {

  def run(table: GraftTable, entriesPerManifest: Int = 100000): Option[Snapshot] = {
    val snap = table.currentSnapshot.getOrElse(return None)
    if (snap.manifests.size <= 1) return None
    val entries = table.files()
    val groups = entries.grouped(math.max(1, entriesPerManifest)).toSeq
    val committed = table.commit("rewrite-manifests", Some(snap.id)) { _ =>
      val manifests = groups.map(table.writeManifest)
      (manifests, Map(
        "manifests-before" -> snap.manifests.size.toString,
        "manifests-after" -> manifests.size.toString,
        "files" -> entries.size.toString))
    }
    Some(committed)
  }
}
