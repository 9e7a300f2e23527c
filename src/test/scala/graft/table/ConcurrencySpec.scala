package graft.table

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth

/**
 * Optimistic-concurrency commit protocol under real contention: appends
 * retry against the new parent and all land; rewrites planned against a
 * stale snapshot fail fast with a replan error instead of clobbering
 * (the engine's replacement for the reference's last-writer-wins
 * DROP/RENAME swap, `hive/HiveTableIR.java:296-299`).
 */
class ConcurrencySpec extends SparkSuite {

  test("concurrent appends all commit; chain stays linear") {
    val tbl = GraftTable.create(spark, tmpDir("conc-append"), Synth.pageSchema)
    val writers = 6
    val rowsEach = 40
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val results = (0 until writers).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          val df = Synth.pages(spark, rowsEach, hosts = 3, partitions = 1, seed = 100 + i)
            .withColumn("url", concat(lit(s"w$i/"), col("url")))
          start.await()
          tbl.append(df).id
        }
      })
    }
    start.countDown()
    val ids = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()

    assert(ids.distinct.size === writers, "every append must get its own snapshot")
    assert(tbl.read().count() === writers.toLong * rowsEach)
    // parent chain from current back to the root covers all committed snapshots
    val md = tbl.metadata
    var cursor = md.currentSnapshot
    var seen = List.empty[Long]
    while (cursor.nonEmpty) {
      seen ::= cursor.get.id
      cursor = cursor.get.parentId.flatMap(md.snapshot)
    }
    assert(seen.toSet === ids.toSet, "linear history must contain every commit exactly once")
  }

  test("rewrite planned against a stale snapshot fails fast with replan") {
    val tbl = GraftTable.create(spark, tmpDir("conc-rewrite"), Synth.pageSchema)
    val s1 = tbl.append(Synth.pages(spark, 100, hosts = 3, partitions = 2)).id
    val victim = tbl.files().head
    // another writer commits first
    tbl.append(Synth.pages(spark, 50, hosts = 3, partitions = 1, seed = 9)
      .withColumn("url", concat(lit("x/"), col("url"))))
    val ex = intercept[IllegalArgumentException] {
      tbl.replaceFiles(Set(victim.path), Seq.empty, "compact",
        expectedSnapshotId = Some(s1))
    }
    assert(ex.getMessage.contains("replan"))
    // table unharmed: all rows still present
    assert(tbl.read().count() === 150)
  }

  test("removing a file already removed by a racing rewrite is refused") {
    val tbl = GraftTable.create(spark, tmpDir("conc-remove"), Synth.pageSchema)
    tbl.append(Synth.pages(spark, 100, hosts = 3, partitions = 2))
    val victim = tbl.files().head
    tbl.replaceFiles(Set(victim.path), Seq.empty, "delete") // first rewrite wins
    val ex = intercept[IllegalArgumentException] {
      tbl.replaceFiles(Set(victim.path), Seq.empty, "delete") // same file again
    }
    assert(ex.getMessage.contains("not present"))
  }

  test("branch and main appends race: both land, heads stay independent") {
    val tbl = GraftTable.create(spark, tmpDir("conc-branch"), Synth.pageSchema)
    tbl.append(Synth.pages(spark, 60, hosts = 3, partitions = 1))
    tbl.createBranch("st")
    val writers = 6 // even → branch, odd → main, all racing on one CAS chain
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val results = (0 until writers).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          val df = Synth.pages(spark, 20, hosts = 3, partitions = 1, seed = 200 + i)
            .withColumn("url", concat(lit(s"w$i/"), col("url")))
          start.await()
          tbl.append(df, toBranch = if (i % 2 == 0) Some("st") else None).id
        }
      })
    }
    start.countDown()
    val ids = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(ids.distinct.size === writers)
    assert(tbl.read().count() === 60 + 3 * 20, "main sees only main appends")
    assert(tbl.readRef("st").count() === 60 + 3 * 20, "branch sees base + staged only")
    tbl.publish("st") // cherry-pick (main advanced): everything lands once
    assert(tbl.read().count() === 60 + 6 * 20)
  }
}
