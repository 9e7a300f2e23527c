package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.{Maintenance, Synth}
import graft.table.GraftTable

/** Checkpoint-resume behavior of the rewrite ops (north rule): a pass that
  * died after staging but before commit reuses its staged output; a pass
  * that committed is idempotent on rerun. */
class ResumeSpec extends SparkSuite {

  test("cluster: rerun after commit returns the committed snapshot unchanged") {
    val root = tmpDir("graft-cres")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(Synth.pages(spark, 3000, partitions = 6))
    val runId = "cluster-resume-1"
    val s1 = Cluster.zorderRewrite(t, Cluster.ZDims(), targetFileBytes = 512 * 1024, runId = runId)
    val v1 = t.currentVersion
    val s2 = Cluster.zorderRewrite(t, Cluster.ZDims(), targetFileBytes = 512 * 1024, runId = runId)
    assert(s2.map(_.id) == s1.map(_.id), "rerun must return the committed snapshot")
    assert(t.currentVersion == v1, "rerun must not create a new metadata version")
  }

  test("cluster: staged-but-uncommitted run resumes without rewriting") {
    val root = tmpDir("graft-cres2")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(Synth.pages(spark, 3000, partitions = 6))
    val runId = "cluster-resume-2"
    val n = t.read().count()
    Cluster.zorderRewrite(t, Cluster.ZDims(), targetFileBytes = 512 * 1024, runId = runId)
    // simulate "crashed before commit": roll back metadata pointer state by
    // deleting the committed marker from the step log only
    val log = Maintenance.load(t, runId).get
    Maintenance.save(t, log.copy(committedSnapshotId = None))
    // staged dir still complete → rerun must fail the expectedSnapshotId
    // check (table already advanced past the planned snapshot) rather than
    // double-apply
    val err = intercept[Exception] {
      Cluster.zorderRewrite(t, Cluster.ZDims(), targetFileBytes = 512 * 1024, runId = runId)
    }
    assert(err.getMessage.contains("advanced past planned snapshot") ||
      err.getMessage.contains("planned against snapshot") ||
      err.getMessage.contains("not present in current snapshot"),
      s"unexpected: ${err.getMessage}")
    assert(t.read().count() == n, "no data corruption from the refused rerun")
  }

  test("merge: resume refuses a rewrite staged against an older snapshot") {
    val root = tmpDir("graft-mres-stale")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(Synth.pages(spark, 1000, partitions = 2))
    val runId = "merge-stale-1"
    // simulate a crash-window interleaving: a run planned (and staged its
    // rewrite) against snapshot S, then a concurrent append advanced the
    // table before the resume — reusing the staged output would drop the
    // appended rows at replaceFiles
    val staleLog = graft.run.Maintenance.start(t, runId, "merge")
    graft.run.Maintenance.markDone(t, staleLog,
      s"plan@${t.currentSnapshot.get.id}")
    t.append(Synth.pages(spark, 200, partitions = 1, seed = 9)) // concurrent
    val src = Synth.pages(spark, 50, versions = 2, partitions = 1)
      .withColumn("_deleted", lit(false))
    val err = intercept[Exception] { Merge.into(t, src, runId = runId) }
    assert(err.getMessage.contains("advanced past the planned snapshot"),
      s"unexpected: ${err.getMessage}")
    // a FRESH runId proceeds normally on the advanced table
    assert(Merge.into(t, src, runId = "merge-stale-2").operation === "merge")
  }

  test("merge: rerun with same runId after commit is a no-op") {
    val root = tmpDir("graft-mres")
    val t = GraftTable.create(spark, root, Synth.pageSchema)
    t.append(Synth.pages(spark, 2000, partitions = 4))
    val src = Synth.pages(spark, 100, versions = 2, partitions = 1)
      .withColumn("_deleted", lit(false))
    val runId = "merge-resume-1"
    val s1 = Merge.into(t, src, runId = runId)
    val n1 = t.read().count()
    val s2 = Merge.into(t, src, runId = runId)
    assert(s2.id == s1.id)
    assert(t.read().count() == n1)
  }
}
