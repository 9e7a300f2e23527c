package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Cluster, Compact, Expire, Merge}
import graft.run.Synth

/**
 * Merge-on-read equality deletes: tombstone commits rewrite NO data files;
 * every read path anti-joins the tombstones; compaction applies them
 * opportunistically; a full cluster rewrite materializes and clears them;
 * GC tracks tombstone files like data files.
 */
class MorDeleteSpec extends SparkSuite {

  private def mk(root: String, n: Long = 400): GraftTable = {
    val tbl = GraftTable.create(spark, root, Synth.pageSchema)
    tbl.append(Synth.pages(spark, n, hosts = 6, partitions = 4))
    tbl
  }

  test("tombstone delete hides keys without touching data files") {
    val tbl = mk(tmpDir("mor"))
    val before = tbl.files().map(_.path).toSet
    val preSnap = tbl.currentSnapshot.get.id
    val victims = tbl.read().select("url").orderBy("url").limit(25)

    tbl.deleteByKeysMoR(victims)
    assert(tbl.files().map(_.path).toSet === before, "no data file may be rewritten")
    assert(tbl.read().count() === 400 - 25)
    assert(tbl.read().join(victims, Seq("url"), "inner").count() === 0)
    // predicate reads apply tombstones too
    assert(tbl.read(Some(col("lang").isNotNull)).count() === 375)
    // snapshot isolation: pre-delete snapshot unaffected
    assert(tbl.readSnapshot(preSnap).count() === 400)
    // equality-delete semantics: a re-appended tombstoned key stays hidden
    val delSnap = tbl.currentSnapshot.get.id
    val resurrect = tbl.readSnapshot(preSnap).join(victims, Seq("url"), "inner").limit(5)
    tbl.append(resurrect)
    assert(tbl.read().count() === 375)
    // incremental read agrees with read(): the re-appended tombstoned keys
    // must be hidden from CDC consumers too
    assert(tbl.incrementalRead(delSnap).count() === 0)
  }

  test("overwrite replaces every file, so it clears tombstones") {
    val tbl = mk(tmpDir("mor-overwrite"))
    val victims = tbl.read().select("url").orderBy("url").limit(10)
    tbl.deleteByKeysMoR(victims)
    // fresh data re-using a tombstoned url must be fully visible afterwards
    val fresh = tbl.readSnapshot(tbl.metadata.snapshots.head.id)
      .limit(50)
    fresh.write.format("graft").mode("overwrite").save(tbl.root)
    assert(tbl.tombstones().isEmpty, "overwrite must clear tombstones")
    assert(tbl.read().count() === 50)
    assert(spark.read.format("graft").load(tbl.root).count() === 50)
  }

  test("PARTIAL compaction applies tombstones to rewritten files and keeps them") {
    val tbl = mk(tmpDir("mor-compact"))
    // one file too big to be a compaction candidate → the pass is partial
    tbl.append(Synth.pages(spark, 4000, hosts = 6, partitions = 1, seed = 7))
    val victims = tbl.read().select("url").orderBy("url").limit(20)
    tbl.deleteByKeysMoR(victims)
    val big = tbl.files().map(_.bytes).max
    Compact.run(tbl, targetBytes = big) // threshold 0.75*big excludes the big file
    assert(tbl.files().map(_.bytes).max === big, "big file must not be rewritten")
    assert(tbl.tombstones().nonEmpty, "partial rewrites must keep tombstones")
    assert(tbl.read().count() === 4400 - 20)
    assert(tbl.read().join(victims, Seq("url"), "inner").count() === 0)
  }

  test("FULL-COVERAGE compaction materializes and clears tombstones; merge unblocked") {
    val tbl = mk(tmpDir("mor-compact-all"))
    val victims = tbl.read().select("url").orderBy("url").limit(20)
    tbl.deleteByKeysMoR(victims)
    val from = tbl.currentSnapshot.get.id
    val snap = Compact.run(tbl, targetBytes = 1L << 30)
    assert(snap.nonEmpty, "compact-all must have work (applying tombstones)")
    assert(tbl.tombstones().isEmpty, "rewriting every file materializes the tombstones")
    assert(snap.get.summary.get("materialized-tombstones").contains("true"),
      "the commit is not row-preserving and must say so for incremental readers")
    assert(tbl.read().count() === 380)
    // physically gone: raw file scan (no anti-join) agrees
    assert(spark.read.schema(tbl.schema).parquet(tbl.files().map(tbl.absPath): _*)
      .count() === 380)
    // incremental readers crossing the materialization are told loudly
    val ex = intercept[IllegalArgumentException](tbl.incrementalRead(from).count())
    assert(ex.getMessage.contains("materialized tombstones"), ex.getMessage)
    // MERGE was blocked by live tombstones; the compact-all unblocked it
    val changes = tbl.read().limit(5).withColumn("text", lit("merged"))
    Merge.into(tbl, changes)
    assert(tbl.read().filter(col("text") === "merged").count() === 5)
  }

  test("compact-all covers SINGLETON files while tombstones are live") {
    val root = tmpDir("mor-compact-one")
    val tbl = GraftTable.create(spark, root, Synth.pageSchema)
    tbl.append(Synth.pages(spark, 100, hosts = 4, partitions = 1)) // ONE file
    tbl.deleteByKeysMoR(tbl.read().select("url").orderBy("url").limit(5))
    val snap = Compact.run(tbl, targetBytes = 1L << 30)
    assert(snap.nonEmpty, "a singleton group is useful when it applies tombstones")
    assert(tbl.tombstones().isEmpty)
    assert(tbl.read().count() === 95)
    // without tombstones the same singleton plan stays a no-op
    assert(Compact.run(tbl, targetBytes = 1L << 30).isEmpty)
  }

  test("full cluster rewrite materializes and clears tombstones") {
    val tbl = mk(tmpDir("mor-cluster"))
    val victims = tbl.read().select("url").orderBy("url").limit(30)
    tbl.deleteByKeysMoR(victims)
    Cluster.zorderRewrite(tbl, Cluster.ZDims(), targetFileBytes = 1L << 20)
    assert(tbl.tombstones().isEmpty, "full rewrite must clear tombstones")
    assert(tbl.read().count() === 370)
    // physically gone: raw file scan (no anti-join) agrees
    val raw = spark.read.schema(tbl.schema).parquet(tbl.files().map(tbl.absPath): _*)
    assert(raw.count() === 370)
    // key is deletable again after materialization
    tbl.deleteByKeysMoR(tbl.read().select("url").limit(1))
    assert(tbl.read().count() === 369)
  }

  test("incremental read refuses a range crossing tombstone materialization") {
    // the trap: key tombstoned before `from`, re-appended inside the range,
    // then a full cluster rewrite MATERIALIZES the tombstones — at `to` the
    // tombstone list is empty, so a naive file-level diff would return the
    // re-appended row that read() at `to` (correctly) no longer hides
    val tbl = mk(tmpDir("mor-incr-mat"))
    val victims = tbl.read().select("url").orderBy("url").limit(5)
    tbl.deleteByKeysMoR(victims)
    val from = tbl.currentSnapshot.get.id
    val resurrect = tbl.readSnapshot(tbl.metadata.snapshots.head.id)
      .join(victims, Seq("url"), "inner").limit(3)
    tbl.append(resurrect)
    Cluster.zorderRewrite(tbl, Cluster.ZDims(), targetFileBytes = 1L << 20) // materializes
    val ex = intercept[IllegalArgumentException](tbl.incrementalRead(from).count())
    assert(ex.getMessage.contains("materialized tombstones"), ex.getMessage)
    // a cluster rewrite with NO live tombstones stays row-preserving
    val tbl2 = mk(tmpDir("mor-incr-clean"))
    val from2 = tbl2.currentSnapshot.get.id
    tbl2.append(Synth.pages(spark, 50, hosts = 6, partitions = 1, seed = 9))
    Cluster.zorderRewrite(tbl2, Cluster.ZDims(), targetFileBytes = 1L << 20)
    assert(tbl2.incrementalRead(from2).count() === 50)
  }

  test("merge refuses while tombstones are live; SQL relation refuses too") {
    val tbl = mk(tmpDir("mor-merge"))
    tbl.deleteByKeysMoR(tbl.read().select("url").limit(3))
    val changes = tbl.read().limit(5).withColumn("text", lit("new"))
    assert(intercept[IllegalArgumentException](Merge.into(tbl, changes))
      .getMessage.contains("tombstones"))
    assert(intercept[IllegalArgumentException](
      spark.read.format("graft").load(tbl.root).count())
      .getMessage.contains("tombstones"))
  }

  test("expire GCs tombstone files of dropped snapshots") {
    val tbl = mk(tmpDir("mor-expire"), n = 200)
    tbl.deleteByKeysMoR(tbl.read().select("url").limit(10))
    val delFile = tbl.tombstones().head
    Cluster.zorderRewrite(tbl, Cluster.ZDims(), targetFileBytes = 1L << 30) // clears
    val res = Expire.expire(tbl, retainLast = 1)
    assert(res.removedSnapshots.nonEmpty)
    assert(res.deletedDataFiles.contains(delFile.path),
      "tombstone file must be GC'd once no retained snapshot references it")
    assert(!FileIO.exists(tbl.absPath(delFile)))
    assert(tbl.read().count() === 190)
  }
}
