package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSuite
import graft.run.Synth
import graft.table.GraftTable

/**
 * Streaming CDC read of a graft table (`spark.readStream.format("graft")`):
 * the continuous form of the reference's checkpointed incremental-load loop
 * (`util/TimeStampUtil.java:53-109`).
 */
class StreamCdcSpec extends SparkSuite {

  private def pagesTagged(n: Long, seed: Long, tag: String): DataFrame =
    Synth.pages(spark, n, partitions = 2, seed = seed)
      .withColumn("url", concat(col("url"), lit(s"?b=$tag")))

  /** Run the CDC stream until drained, collecting (batchId, urls) pairs. */
  private def drain(
      root: String,
      ckpt: String,
      sink: ConcurrentLinkedQueue[(Long, Seq[String])],
      options: Map[String, String] = Map.empty): Unit = {
    val reader = options.foldLeft(spark.readStream.format("graft")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(root).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val urls = batch.select("url").collect().map(_.getString(0)).toSeq
        sink.add((batchId, urls)); ()
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
  }

  test("tail appends exactly once: initial snapshot, incremental batches, checkpoint restart") {
    val root = tmpDir("graft-cdc")
    val ckpt = tmpDir("graft-cdc-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(100, 1, "a"))

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    def urls: Seq[String] = {
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.flatMap(_._2)
    }

    // first run: the table's current contents arrive as the initial batch
    drain(root, ckpt, got)
    assert(urls.size == 100 && urls.distinct.size == 100, "initial snapshot delivered once")

    // two more appends while the stream is down; restart from the checkpoint
    t.append(pagesTagged(50, 2, "b"))
    t.append(pagesTagged(30, 3, "c"))
    drain(root, ckpt, got)
    assert(urls.size == 180 && urls.distinct.size == 180,
      s"appends delivered exactly once across restart (got ${urls.size})")
    assert(urls.count(_.endsWith("?b=b")) == 50 && urls.count(_.endsWith("?b=c")) == 30)

    // restart with nothing new: no rows, no duplicate delivery
    drain(root, ckpt, got)
    assert(urls.size == 180, "idle restart must deliver nothing")

    // compaction is row-preserving: invisible to the tail
    graft.ops.Compact.run(t, targetBytes = 1L << 30)
    t.append(pagesTagged(20, 4, "d"))
    drain(root, ckpt, got)
    assert(urls.size == 200 && urls.distinct.size == 200,
      "compaction emits nothing; the post-compaction append arrives once")
  }

  test("a branch cherry-pick publish streams as a plain append batch") {
    val root = tmpDir("graft-cdc-pub")
    val ckpt = tmpDir("graft-cdc-pub-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(50, 1, "base"))
    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    def urls: Seq[String] = {
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.flatMap(_._2)
    }
    drain(root, ckpt, got)
    assert(urls.size == 50)

    // staged rows never reach a main tail
    t.createBranch("wap")
    t.append(pagesTagged(30, 2, "staged"), toBranch = Some("wap"))
    drain(root, ckpt, got)
    assert(urls.size == 50, "staged rows are invisible on main")

    // main advances, then the cherry-pick publish: the tail receives the
    // main append and the published staged rows, each exactly once
    t.append(pagesTagged(20, 3, "madv"))
    t.publish("wap")
    drain(root, ckpt, got)
    assert(urls.size == 100 && urls.distinct.size == 100,
      s"publish delivered as a plain append (got ${urls.size})")
    assert(urls.count(_.endsWith("?b=staged")) == 30)
    assert(urls.count(_.endsWith("?b=madv")) == 20)
  }

  test("starting-snapshot-id tails from a snapshot instead of delivering the initial contents") {
    val root = tmpDir("graft-cdc-tail")
    val ckpt = tmpDir("graft-cdc-tail-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(100, 1, "old"))
    val from = t.currentSnapshot.get.id
    t.append(pagesTagged(40, 2, "new"))

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    drain(root, ckpt, got, Map("starting-snapshot-id" -> from.toString))
    import scala.jdk.CollectionConverters._
    val urls = got.asScala.toSeq.flatMap(_._2)
    assert(urls.size == 40 && urls.forall(_.endsWith("?b=new")),
      "only rows appended after the starting snapshot are delivered")
  }

  test("row-changing commit fails the query by default; skip-change-commits skips it") {
    val root = tmpDir("graft-cdc-merge")
    val ckpt = tmpDir("graft-cdc-merge-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(60, 1, "a"))

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    drain(root, ckpt, got) // initial snapshot committed to the checkpoint

    // a merge (copy-on-write rewrite) lands in the undelivered range
    val upd = t.read().limit(5)
      .withColumn("warc_ts", col("warc_ts") + expr("interval 400 days"))
      .withColumn("text", lit("rewritten"))
    graft.ops.Merge.into(t, upd, Seq("url"))
    t.append(pagesTagged(10, 2, "late"))

    val ex = intercept[StreamingQueryException] { drain(root, ckpt, got) }
    assert(ex.getMessage.contains("row-changing") || Option(ex.getCause).exists(
      c => String.valueOf(c.getMessage).contains("row-changing")),
      s"query must fail naming the row-changing commit, got: ${ex.getMessage}")

    // opt-out: the merge is skipped, the append still arrives exactly once
    import scala.jdk.CollectionConverters._
    val before = got.asScala.toSeq.flatMap(_._2).size
    drain(root, ckpt, got, Map("skip-change-commits" -> "true"))
    val urls = got.asScala.toSeq.flatMap(_._2)
    assert(urls.size == before + 10 && urls.count(_.endsWith("?b=late")) == 10,
      "skip-change-commits: merge emits nothing, append delivered once")
  }

  test("tombstones at the batch snapshot are applied to delivered rows") {
    val root = tmpDir("graft-cdc-mor")
    val ckpt = tmpDir("graft-cdc-mor-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(20, 1, "base"))
    val from = t.currentSnapshot.get.id

    // append 30 rows, then MoR-tombstone 7 of them before the stream runs
    t.append(pagesTagged(30, 2, "x"))
    import spark.implicits._
    val dead = t.read().filter(col("url").endsWith("?b=x"))
      .select("url").as[String].take(7).toSeq
    t.deleteByKeysMoR(dead.toDF("url"))

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    drain(root, ckpt, got, Map(
      "starting-snapshot-id" -> from.toString, "skip-change-commits" -> "true"))
    import scala.jdk.CollectionConverters._
    val urls = got.asScala.toSeq.flatMap(_._2)
    assert(urls.size == 23, s"tombstoned keys must not be delivered (got ${urls.size})")
    assert(dead.forall(u => !urls.contains(u)))
  }

  test("writeStream sink: graft-to-graft pipe delivers exactly once across restarts") {
    val srcRoot = tmpDir("graft-pipe-src")
    val dstRoot = tmpDir("graft-pipe-dst")
    val ckpt = tmpDir("graft-pipe-ckpt")
    val src = GraftTable.create(spark, srcRoot, Synth.pageSchema)
    src.append(pagesTagged(100, 1, "a"))

    def pipe(): Unit = {
      val q = spark.readStream.format("graft").load(srcRoot)
        .withColumn("lang", lit("xx")) // a transform in the middle
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .start(dstRoot)
      try { q.processAllAvailable() } finally { q.stop() }
    }

    pipe() // creates the destination table from the first batch's schema
    val dst = GraftTable.load(spark, dstRoot)
    assert(dst.read().count() === 100)
    assert(dst.read().filter(col("lang") === "xx").count() === 100,
      "the mid-pipe transform must apply")
    assert(dst.currentSnapshot.get.summary.contains("stream-batch-id"))
    // sink-written files must carry timestamp bounds: the write executes
    // under the streaming CLONED session, where an original-session
    // outputTimestampType conf would be invisible and INT96 (stat-less)
    // timestamps would silently kill warc_ts pruning
    assert(dst.files().forall(f => f.minValues.contains("warc_ts")),
      "sink-written files lost timestamp stats (INT96 written under the cloned session?)")

    // two more source commits while the pipe is down; restart resumes
    src.append(pagesTagged(40, 2, "b"))
    src.append(pagesTagged(20, 3, "c"))
    pipe()
    assert(dst.read().count() === 160, "each source append delivered exactly once")
    import spark.implicits._
    assert(dst.read().select("url").as[String].collect().distinct.length === 160)

    // idle restart: no duplicate snapshots
    val snaps = dst.metadata.snapshots.size
    pipe()
    assert(dst.read().count() === 160 && dst.metadata.snapshots.size === snaps)
  }

  test("max-snapshots-per-trigger bounds each micro-batch to the chain prefix") {
    val root = tmpDir("graft-cdc-cap")
    val ckpt = tmpDir("graft-cdc-cap-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(10, 1, "s1"))
    val from = t.currentSnapshot.get.id
    t.append(pagesTagged(11, 2, "s2"))
    t.append(pagesTagged(12, 3, "s3"))
    t.append(pagesTagged(13, 4, "s4"))

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    drain(root, ckpt, got, Map(
      "starting-snapshot-id" -> from.toString, "max-snapshots-per-trigger" -> "1"))
    import scala.jdk.CollectionConverters._
    val batches = got.asScala.toSeq.filter(_._2.nonEmpty).sortBy(_._1)
    assert(batches.map(_._2.size) == Seq(11, 12, 13),
      s"one append per micro-batch, in commit order (got ${batches.map(_._2.size)})")
    assert(batches.flatMap(_._2).distinct.size == 36)
  }

  test("change-rows mode: a tailing consumer folds insert/delete events back to read()") {
    import graft.table.Changelog
    val root = tmpDir("graft-cdc-rows")
    val ckpt = tmpDir("graft-cdc-rows-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(100, 1, "a"))

    // (batchId, commitId, changeType, url, tsMillis, text, lang)
    type Ev = (Long, Long, String, String, Long, String, String)
    val got = new ConcurrentLinkedQueue[Ev]()
    def drainChanges(): Unit = {
      val q = spark.readStream.format("graft").option("change-rows", "true").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.select(col(Changelog.CommitCol), col(Changelog.ChangeTypeCol),
            col("url"), col("warc_ts").cast("long"), col("text"), col("lang"))
            .collect().foreach(r => got.add((batchId, r.getLong(0), r.getString(1),
              r.getString(2), r.getLong(3), r.getString(4), r.getString(5))))
          ()
        }
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
    }

    drainChanges() // initial snapshot as insert events
    import scala.jdk.CollectionConverters._
    assert(got.asScala.count(_._3 == "insert") == 100 && got.asScala.forall(_._3 == "insert"))

    // while the stream is down: a merge (updates+deletes+inserts), a MoR
    // tombstone delete, and a plain append — the full row-changing mix the
    // append-only mode must refuse or drop
    import spark.implicits._
    val cur = t.read().as[(String, java.sql.Timestamp, Array[Byte], String, String)]
      .collect().map(r => r._1 -> r).toMap
    val ks = cur.keys.toSeq.sorted
    val src = ks.take(10).map { u => val o = cur(u)
        (u, new java.sql.Timestamp(o._2.getTime + 1000L), o._3, "UPD", o._5, false) }
      .++(ks.slice(20, 25).map { u => val o = cur(u)
        (u, new java.sql.Timestamp(o._2.getTime + 1000L), o._3, "D", o._5, true) })
      .++((0 until 7).map(i => (s"https://new.example.com/$i",
        new java.sql.Timestamp(1735689600000L), Array[Byte](1), s"NEW$i", "en", false)))
      .toDF("url", "warc_ts", "html", "text", "lang", "_deleted")
    graft.ops.Merge.into(t, src)
    t.deleteByKeysMoR(t.read().select("url").orderBy(desc("url")).limit(4))
    t.append(pagesTagged(20, 9, "z"))

    drainChanges()
    // fold in (batch, commit) order: state := (state \ deletes) ∪ inserts
    val state = scala.collection.mutable.Map.empty[(String, Long, String, String), Int]
    def key(e: Ev) = (e._4, e._5, e._6, e._7)
    for (e <- got.asScala.toSeq.sortBy(x => (x._1, x._2))) e._3 match {
      case "insert" => state(key(e)) = state.getOrElse(key(e), 0) + 1
      case "delete" =>
        val k = key(e); val n = state.getOrElse(k, 0)
        assert(n > 0, s"delete event for a row the consumer never saw: $k")
        if (n == 1) state.remove(k) else state(k) = n - 1
    }
    val expect = t.read().select(col("url"), col("warc_ts").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(state.toMap === expect, "folded consumer state must equal read()")

    // idle restart: nothing re-delivered
    val before = got.size()
    drainChanges()
    assert(got.size() == before, "idle restart must deliver no events")
  }

  test("change-rows streams positional deletes; a tailing consumer matches read()") {
    import graft.table.Changelog
    val root = tmpDir("graft-cdc-dv")
    val ckpt = tmpDir("graft-cdc-dv-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(120, 3, "a"))

    type Ev = (Long, Long, String, String) // (batch, commit, changeType, url)
    val got = new ConcurrentLinkedQueue[Ev]()
    def drainChanges(): Unit = {
      val q = spark.readStream.format("graft").option("change-rows", "true").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.select(col(Changelog.CommitCol), col(Changelog.ChangeTypeCol), col("url"))
            .collect().foreach(r => got.add((batchId, r.getLong(0), r.getString(1), r.getString(2))))
          ()
        }
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
    }

    drainChanges() // initial inserts
    // while the stream is down: a positional delete, then an append
    val delUrls = t.read().filter(col("lang") === "en")
      .select("url").collect().map(_.getString(0)).toSet
    assert(delUrls.nonEmpty)
    assert(t.deleteWherePositional(col("lang") === "en").nonEmpty)
    t.append(pagesTagged(30, 4, "b"))

    drainChanges()
    import scala.jdk.CollectionConverters._
    val deletes = got.asScala.filter(_._3 == "delete").map(_._4).toSet
    assert(deletes == delUrls, "streamed delete events must be exactly the DV-deleted rows")
    // fold reconstructs read()
    val state = scala.collection.mutable.Map.empty[String, Int]
    for (e <- got.asScala.toSeq.sortBy(x => (x._1, x._2))) e._3 match {
      case "insert" => state(e._4) = state.getOrElse(e._4, 0) + 1
      case "delete" =>
        val n = state.getOrElse(e._4, 0); assert(n > 0)
        if (n == 1) state.remove(e._4) else state(e._4) = n - 1
    }
    val expect = t.read().select("url").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(state.toMap == expect, "folded stream state must equal read()")
  }

  test("appends-only stream: skip-change-commits drops a delete-pos commit; delivered rows respect DVs") {
    val root = tmpDir("graft-cdc-dvskip")
    val ckpt = tmpDir("graft-cdc-dvskip-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(80, 5, "a"))
    val sink = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    drain(root, ckpt, sink, Map("skip-change-commits" -> "true"))
    import scala.jdk.CollectionConverters._
    assert(sink.asScala.flatMap(_._2).size == 80)

    // append a batch, then positionally delete some of ITS rows before the
    // stream catches up: the delivered rows must respect the DVs (read()
    // parity at the batch snapshot), and the delete-pos commit is skipped
    t.append(pagesTagged(40, 6, "b"))
    val victims = t.read().filter(col("url").contains("b=b") && col("lang") === "en")
    val nVictims = victims.count()
    assert(nVictims > 0)
    assert(t.deleteWherePositional(col("url").contains("b=b") && col("lang") === "en").nonEmpty)
    drain(root, ckpt, sink, Map("skip-change-commits" -> "true"))
    val delivered = sink.asScala.flatMap(_._2).toSeq
    assert(delivered.size == 80 + 40 - nVictims,
      "rows DV-deleted before delivery must not be delivered")
  }

  test("update-images-on labels streamed merge commits as update pre/post images") {
    import graft.table.Changelog
    val root = tmpDir("graft-cdc-upd")
    val ckpt = tmpDir("graft-cdc-upd-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(60, 1, "a"))

    val got = new ConcurrentLinkedQueue[(String, String, String)]() // (type, url, text)
    def drainU(): Unit = {
      val q = spark.readStream.format("graft")
        .option("change-rows", "true").option("update-images-on", "url").load(root)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select(col(Changelog.ChangeTypeCol), col("url"), col("text"))
            .collect().foreach(r => got.add((r.getString(0), r.getString(1), r.getString(2))))
          ()
        }
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
    }

    drainU() // initial snapshot: 60 inserts
    import scala.jdk.CollectionConverters._
    assert(got.asScala.count(_._1 == "insert") == 60)

    import spark.implicits._
    val cur = t.read().as[(String, java.sql.Timestamp, Array[Byte], String, String)]
      .collect().map(r => r._1 -> r).toMap
    val ks = cur.keys.toSeq.sorted
    val src = ks.take(8).map { u => val o = cur(u)
        (u, new java.sql.Timestamp(o._2.getTime + 1000L), o._3, "UPD", o._5, false) }
      .++(ks.slice(20, 23).map { u => val o = cur(u)
        (u, new java.sql.Timestamp(o._2.getTime + 1000L), o._3, "D", o._5, true) })
      .++((0 until 4).map(i => (s"https://new.example.com/ui/$i",
        new java.sql.Timestamp(1735689600000L), Array[Byte](1), s"NEW$i", "en", false)))
      .toDF("url", "warc_ts", "html", "text", "lang", "_deleted")
    graft.ops.Merge.into(t, src)

    drainU()
    val byType = got.asScala.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byType(Changelog.UpdatePreimage) == 8, byType.toString)
    assert(byType(Changelog.UpdatePostimage) == 8, byType.toString)
    assert(byType("delete") == 3 && byType("insert") == 64, byType.toString)
    assert(got.asScala.filter(_._1 == Changelog.UpdatePostimage).forall(_._3 == "UPD"))

    // update-images-on without change-rows fails the query at start
    val bad = spark.readStream.format("graft").option("update-images-on", "url").load(root)
      .writeStream.option("checkpointLocation", tmpDir("graft-cdc-upd-bad"))
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    try intercept[StreamingQueryException](bad.processAllAvailable())
    finally bad.stop()
  }

  test("change-rows keeps the schema pinned at stream start across mid-stream evolution") {
    import graft.table.Changelog
    val root = tmpDir("graft-cdc-pin")
    val ckpt = tmpDir("graft-cdc-pin-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(40, 1, "a"))

    val texts = new ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft").option("change-rows", "true").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the micro-batch schema must stay the one pinned at stream start
        assert(batch.columns.contains("text") && !batch.columns.contains("body"))
        batch.filter(col(Changelog.ChangeTypeCol) === "insert")
          .select("text").collect().foreach(r => texts.add(r.getString(0)))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(texts.size() == 40)
      // rename mid-stream (row-preserving commit), then append NEW-schema
      // rows: the SAME running query must keep delivering under the pinned
      // old column name — field-id resolution reads the new files' `body`
      // column through the pinned schema's `text` field
      t.renameColumn("text", "body")
      t.append(pagesTagged(15, 2, "b").withColumnRenamed("text", "body"))
      q.processAllAvailable()
      assert(texts.size() == 55, s"renamed-era appends must still arrive (got ${texts.size()})")
      import scala.jdk.CollectionConverters._
      assert(texts.asScala.forall(_ != null), "values must bind by field id, not go null")
    } finally q.stop()
  }

  test("max-files-per-trigger chunks the initial snapshot, then chain tailing resumes") {
    val root = tmpDir("graft-cdc-chunk")
    val ckpt = tmpDir("graft-cdc-chunk-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(100, 1, "a")) // partitions=2 → 2 files per append
    t.append(pagesTagged(50, 2, "b"))
    t.append(pagesTagged(30, 3, "c"))
    assert(t.files().size == 6)

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    drain(root, ckpt, got, Map("max-files-per-trigger" -> "2"))
    import scala.jdk.CollectionConverters._
    def batches = got.asScala.toSeq.filter(_._2.nonEmpty).sortBy(_._1)
    assert(batches.size == 3, s"6 files / 2 per trigger = 3 micro-batches (got ${batches.size})")
    assert(batches.flatMap(_._2).size == 180 && batches.flatMap(_._2).distinct.size == 180,
      "chunked initial load delivers the full contents exactly once")

    // after the initial load, appends tail as whole commits
    t.append(pagesTagged(20, 4, "d"))
    drain(root, ckpt, got, Map("max-files-per-trigger" -> "2"))
    assert(batches.size == 4 && batches.flatMap(_._2).distinct.size == 200)
    // idle restart: nothing re-delivered
    drain(root, ckpt, got, Map("max-files-per-trigger" -> "2"))
    assert(batches.flatMap(_._2).size == 200)
  }

  test("chunked initial load: restart mid-load resumes at the file position exactly once") {
    val root = tmpDir("graft-cdc-chunk-resume")
    val ckpt = tmpDir("graft-cdc-chunk-resume-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(60, 1, "a"))
    t.append(pagesTagged(40, 2, "b"))
    t.append(pagesTagged(20, 3, "c"))
    // MoR-delete a few keys: every chunk must apply the snapshot's tombstones
    val victims = t.read().select("url").limit(5).collect().map(_.getString(0)).toSeq
    t.deleteByKeysMoR(spark.createDataset(victims)(
      org.apache.spark.sql.Encoders.STRING).toDF("url"))
    val snapDel = t.currentSnapshot.get.id

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    // Trigger.Once = exactly one micro-batch, then stop: each run is a REAL
    // restart from the checkpoint with a fresh source instance
    def oneBatch(): Unit = {
      val q = spark.readStream.format("graft").option("max-files-per-trigger", "2")
        .load(root).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          got.add((batchId, batch.select("url").collect().map(_.getString(0)).toSeq)); ()
        }
        .start()
      try { q.awaitTermination() } finally { q.stop() }
    }
    import scala.jdk.CollectionConverters._
    def urls = got.asScala.toSeq.flatMap(_._2)

    oneBatch() // chunk 1: files [0,2)
    val afterFirst = urls.size
    assert(afterFirst > 0 && afterFirst < 115, s"first chunk is a strict subset ($afterFirst)")
    // the offset log holds a mid-initial position, not a snapshot id
    val off0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$ckpt/offsets/0")))
    assert(off0.contains(s"""{"snapshot":$snapDel,"file":2}"""), s"offset 0 was: $off0")

    oneBatch() // restart: chunk 2 resumes at file 2
    assert(urls.size > afterFirst && urls.size < 115, "second chunk advances, still partial")

    // drain the rest (chunk 3 + completion)
    drain(root, ckpt, got, Map("max-files-per-trigger" -> "2"))
    assert(urls.size == 115 && urls.distinct.size == 115,
      s"chunks across restarts union to the tombstone-filtered contents (got ${urls.size})")
    assert(victims.forall(v => !urls.contains(v)), "tombstoned keys never delivered")
    assert(urls.toSet == t.read().select("url").collect().map(_.getString(0)).toSet)
  }

  test("change-rows initial load chunks into insert events exactly once") {
    val root = tmpDir("graft-cdc-chunk-rows")
    val ckpt = tmpDir("graft-cdc-chunk-rows-ckpt")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(pagesTagged(50, 1, "a"))
    t.append(pagesTagged(50, 2, "b"))

    val got = new ConcurrentLinkedQueue[(Long, Seq[String])]()
    val q = spark.readStream.format("graft")
      .option("change-rows", "true").option("max-files-per-trigger", "1")
      .load(root).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.collect()
        assert(rows.forall(r =>
          r.getString(r.fieldIndex(graft.table.Changelog.ChangeTypeCol)) == "insert"))
        got.add((batchId, rows.map(_.getString(0)).toSeq)); ()
      }
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    import scala.jdk.CollectionConverters._
    val batches = got.asScala.toSeq.filter(_._2.nonEmpty)
    assert(batches.size == 4, s"4 files / 1 per trigger (got ${batches.size})")
    val urls = batches.flatMap(_._2)
    assert(urls.size == 100 && urls.distinct.size == 100)
  }
}
