package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.{Cluster, Compact}
import graft.run.Synth

/** Hidden partitioning (`partition-spec` table property): writers group
  * rows so each data file covers one transform value; transform predicates
  * prune; files written before a spec existed stay readable and prunable. */
class HiddenPartitionSpec extends SparkSuite {

  private val prop = Map(PartitionSpec.Property -> "days(warc_ts)")

  private def dayOfMicros(micros: Long): Long = Math.floorDiv(micros, 86400L * 1000000L)

  test("appends write one partition value per file; transform predicates prune") {
    val t = GraftTable.create(spark, tmpDir("graft-hp"), Synth.pageSchema, prop)
    t.append(Synth.pages(spark, 3000, partitions = 4))
    val files = t.files()
    assert(files.size > 5, s"30-day corpus must split by day, got ${files.size}")
    assert(files.forall(_.path.contains("gp_days_warc_ts=")),
      "files must live under partition directories")
    // one day per file — the transform bounds are exact
    for (f <- files) {
      assert(dayOfMicros(f.minValues("warc_ts").toLong) ===
        dayOfMicros(f.maxValues("warc_ts").toLong), s"file ${f.path} spans days")
    }
    // hidden: the partition column is NOT in the data
    assert(t.read().columns.toSeq === Synth.pageSchema.fieldNames.toSeq)

    val someDay = t.read().select(to_date(col("warc_ts")).as("d")).orderBy("d").head().getDate(0)
    val pred = to_date(col("warc_ts")) === lit(someDay)
    val planned = t.planFiles(Some(pred))
    assert(planned.size < files.size / 2, s"day predicate must prune: ${planned.size}/${files.size}")
    assertSameRows(t.read(Some(pred)), t.read().filter(pred), "day-pruned scan")
    // raw timestamp predicates keep pruning too
    val rawPred = col("warc_ts") < lit(new java.sql.Timestamp(
      someDay.getTime + 86400L * 1000)) // someDay end-of-day
    assert(t.planFiles(Some(rawPred)).size < files.size)
  }

  test("maintenance keeps the partition grouping; old pre-spec files stay readable") {
    // table born WITHOUT a spec
    val t = GraftTable.create(spark, tmpDir("graft-hp-evolve"), Synth.pageSchema)
    t.append(Synth.pages(spark, 1000, partitions = 2))
    val preFiles = t.files().map(_.path).toSet
    assert(preFiles.forall(p => !p.contains("gp_days_warc_ts=")))
    val preCount = t.read().count()
    // declare the spec later — old files untouched, still scanned fine
    t.commitMetadataUpdate(md => md.copy(
      properties = md.properties + (PartitionSpec.Property -> "days(warc_ts)")))
    t.append(Synth.pages(spark, 1000, partitions = 2, seed = 9))
    assert(t.read().count() === preCount + 1000)
    assert(t.files().exists(f => f.path.contains("gp_days_warc_ts=")))
    assert(t.files().exists(f => !f.path.contains("gp_days_warc_ts=")))
    // transform pruning is sound across the mixed layout
    val someDay = t.read().select(to_date(col("warc_ts")).as("d")).head().getDate(0)
    val pred = to_date(col("warc_ts")) === lit(someDay)
    assertSameRows(t.read(Some(pred)), t.read().filter(pred), "mixed-layout day scan")

    // compaction + clustering rewrite EVERYTHING into partition-grouped files
    val pre = t.read()
    Compact.run(t, targetBytes = 1L << 30)
    Cluster.zorderRewrite(t, Cluster.ZDims(), targetFileBytes = 1L << 20)
    assert(t.files().forall(_.path.contains("gp_days_warc_ts=")),
      "maintenance rewrites adopt the partition layout")
    for (f <- t.files())
      assert(dayOfMicros(f.minValues("warc_ts").toLong) ===
        dayOfMicros(f.maxValues("warc_ts").toLong), s"post-maintenance file ${f.path} spans days")
    assertSameRows(t.read(), pre, "post-maintenance scan equality")
  }

  test("merge on a partitioned table keeps day-grouped output files") {
    val t = GraftTable.create(spark, tmpDir("graft-hp-merge"), Synth.pageSchema, prop)
    t.append(Synth.pages(spark, 1500, partitions = 3))
    val pre = t.read()
    val src = pre.orderBy("url").limit(30)
      .withColumn("text", lit("MERGED"))
      .withColumn("warc_ts", col("warc_ts") + org.apache.spark.sql.functions.expr("INTERVAL 1 SECOND"))
    graft.ops.Merge.into(t, src)
    assert(t.read().count() === 1500)
    assert(t.read().filter(col("text") === "MERGED").count() === 30)
    for (f <- t.files())
      assert(dayOfMicros(f.minValues("warc_ts").toLong) ===
        dayOfMicros(f.maxValues("warc_ts").toLong), s"merged file ${f.path} spans days")
    // day pruning still effective after the merge rewrite
    val someDay = t.read().select(to_date(col("warc_ts")).as("d")).head().getDate(0)
    val pred = to_date(col("warc_ts")) === lit(someDay)
    assert(t.planFiles(Some(pred)).size < t.files().size)
    assertSameRows(t.read(Some(pred)), t.read().filter(pred), "post-merge day scan")
  }

  test("transform predicates prune through the SQL scan path too") {
    val t = GraftTable.create(spark, tmpDir("graft-hp-sql"), Synth.pageSchema, prop)
    t.append(Synth.pages(spark, 3000, partitions = 4))
    val nFiles = t.files().size
    val someDay = t.read().select(to_date(col("warc_ts")).as("d")).orderBy("d").head().getDate(0)
    val q = spark.sql(
      s"SELECT url FROM graft.`${t.root}` WHERE to_date(warc_ts) = DATE'$someDay'")
    q.collect() // metrics populate on execution
    val scanned = q.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    assert(scanned < nFiles / 2,
      s"Catalyst-pushed to_date filter must skip files in the FileIndex: $scanned/$nFiles")
    assert(q.count() === t.read().filter(to_date(col("warc_ts")) === lit(someDay)).count())
  }

  test("invalid specs are rejected at create") {
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("graft-hp-bad"), Synth.pageSchema,
        Map(PartitionSpec.Property -> "days(nope)"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("graft-hp-bad2"), Synth.pageSchema,
        Map(PartitionSpec.Property -> "buckets(16, url)"))
    }
  }
}
