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

  test("bucket transform: one bucket per file; equality predicates prune by dir value") {
    val n = 8
    val t = GraftTable.create(spark, tmpDir("graft-hp-bucket"), Synth.pageSchema,
      Map(PartitionSpec.Property -> s"bucket($n, url)"))
    t.append(Synth.pages(spark, 4000, hosts = 20, partitions = 4))
    val files = t.files()
    assert(files.forall(_.path.contains(s"gp_bucket_${n}_url=")),
      "files must live under bucket directories")
    val buckets = files.flatMap(f => t.partitionSpecs.head.dirValue(f.path)).distinct
    assert(buckets.size == n, s"4000 urls over $n buckets must hit all: $buckets")
    // hidden: bucket column NOT in the data
    assert(t.read().columns.toSeq === Synth.pageSchema.fieldNames.toSeq)
    // url = v prunes to v's bucket only (bucket is non-monotonic: only the
    // dir value can prove this)
    val someUrl = t.read().select("url").orderBy("url").head().getString(0)
    val pred = col("url") === lit(someUrl)
    val planned = t.planFiles(Some(pred))
    val expected = files.filter { f =>
      val inBucket = t.partitionSpecs.head
        .bucketOf(org.apache.spark.unsafe.types.UTF8String.fromString(someUrl),
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)
        .map(_.toString) == t.partitionSpecs.head.dirValue(f.path)
      inBucket
    }
    assert(planned.size <= expected.size && planned.size <= files.size / 4,
      s"bucket equality must prune: ${planned.size}/${files.size}")
    assertSameRows(t.read(Some(pred)), t.read().filter(pred), "bucket-pruned scan")
    // IN lists prune too; ranges deliberately do not
    val inPred = col("url").isin(someUrl, someUrl + "x")
    assert(t.planFiles(Some(inPred)).size <= files.size / 2)
    // the SQL scan path (Catalyst-pushed filters through the FileIndex)
    val q = spark.sql(s"SELECT text FROM graft.`${t.root}` WHERE url = '$someUrl'")
    q.collect()
    val scanned = q.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    assert(scanned <= files.size / 4,
      s"SQL url= filter must skip non-bucket files: $scanned/${files.size}")
  }

  test("multi-transform spec: bucket + days nest; both prunings compose") {
    val t = GraftTable.create(spark, tmpDir("graft-hp-multi"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(4, url), days(warc_ts)"))
    t.append(Synth.pages(spark, 3000, partitions = 4))
    val files = t.files()
    assert(files.forall(f => f.path.contains("gp_bucket_4_url=") &&
      f.path.contains("gp_days_warc_ts=")), "files must nest under both transforms")
    for (f <- files)
      assert(dayOfMicros(f.minValues("warc_ts").toLong) ===
        dayOfMicros(f.maxValues("warc_ts").toLong), s"file ${f.path} spans days")
    val row = t.read().select(col("url"), to_date(col("warc_ts")).as("d")).orderBy("url").head()
    val (someUrl, someDay) = (row.getString(0), row.getDate(1))
    val both = col("url") === lit(someUrl) && to_date(col("warc_ts")) === lit(someDay)
    val planned = t.planFiles(Some(both))
    assert(planned.size <= math.max(1, files.size / 8),
      s"conjunction must prune via bucket AND day: ${planned.size}/${files.size}")
    assertSameRows(t.read(Some(both)), t.read().filter(both), "bucket+day scan")
    assertSameRows(t.read(), t.read(None), "full scan sanity")
  }

  test("truncate transform groups files by prefix; raw-range pruning tightens") {
    val t = GraftTable.create(spark, tmpDir("graft-hp-trunc"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "truncate(16, url)"))
    t.append(Synth.pages(spark, 2000, hosts = 12, partitions = 2))
    val files = t.files()
    assert(files.forall(_.path.contains("gp_truncate_16_url=")))
    // each file covers one 16-char url prefix (long enough to split the
    // shared https://host- scheme prefix) → StartsWith/range prune well
    val someUrl = t.read().select("url").orderBy("url").head().getString(0)
    val pred = col("url").startsWith(someUrl.take(16))
    val planned = t.planFiles(Some(pred))
    assert(planned.size < files.size / 2, s"prefix predicate: ${planned.size}/${files.size}")
    assertSameRows(t.read(Some(pred)), t.read().filter(pred), "truncate-pruned scan")
  }

  test("cluster rewrite on a bucketed table stays per-partition: no file explosion") {
    // regression: a GLOBAL range exchange interleaves bucket values across
    // every task; partitionBy would then write ~tasks x buckets tiny files
    // and re-sort by the partition column, destroying the z order
    val t = GraftTable.create(spark, tmpDir("graft-hp-bucket-cluster"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(4, url)"))
    t.append(Synth.pages(spark, 4000, hosts = 20, partitions = 4))
    val pre = t.read()
    val totalBytes = t.files().map(_.bytes).sum
    Cluster.zorderRewrite(t, Cluster.ZDims(), targetFileBytes = totalBytes / 8)
    val files = t.files()
    // ~8 size-targeted files (+ slack for per-bucket rounding), NOT
    // buckets x range-partitions
    assert(files.size <= 16, s"bucketed cluster rewrite exploded: ${files.size} files")
    assert(files.forall(_.path.contains("gp_bucket_4_url=")))
    // within each bucket the z order held: per-file host/ts bounds are tight
    assertSameRows(t.read(), pre, "bucketed cluster scan equality")
    val someUrl = t.read().select("url").orderBy("url").head().getString(0)
    assert(t.planFiles(Some(col("url") === lit(someUrl))).size <= files.size / 2)
  }

  test("compaction bin-packs within partition values, one output file per day") {
    val t = GraftTable.create(spark, tmpDir("graft-hp-compact"), Synth.pageSchema, prop)
    // three small appends → ≥3 small files per day dir
    for (seed <- Seq(1, 2, 3))
      t.append(Synth.pages(spark, 600, partitions = 1, seed = seed))
    val preByDay = t.files().groupBy(f => t.partitionSpecs.head.dirValue(f.path).get)
    assert(preByDay.values.forall(_.size >= 3))
    val pre = t.read()
    Compact.run(t, targetBytes = 1L << 30)
    val postByDay = t.files().groupBy(f => t.partitionSpecs.head.dirValue(f.path).get)
    assert(postByDay.keySet === preByDay.keySet)
    assert(postByDay.values.forall(_.size === 1),
      s"one packed file per day expected: ${postByDay.view.mapValues(_.size).toMap}")
    assertSameRows(t.read(), pre, "partition-aware compaction scan")
  }

  test("months transform groups files; trunc predicates prune via bounds mapping") {
    val t = GraftTable.create(spark, tmpDir("graft-hp-months"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "months(warc_ts)"))
    t.append(Synth.pages(spark, 2000, partitions = 2))
    val files = t.files()
    assert(files.forall(_.path.contains("gp_months_warc_ts=")))
    val months = files.map(f => f.minValues("warc_ts").toLong / (86400L * 1000000L) / 28).distinct
    assert(months.size >= 1) // corpus spans ~30 days → 1-2 month dirs
    val someMonth = t.read()
      .select(trunc(to_date(col("warc_ts")), "month").as("m")).orderBy("m").head().getDate(0)
    val pred = trunc(to_date(col("warc_ts")), "month") === lit(someMonth)
    assertSameRows(t.read(Some(pred)), t.read().filter(pred), "month-transform scan")
    if (files.size > 1 && months.size > 1)
      assert(t.planFiles(Some(pred)).size < files.size)
  }

  test("SQL DDL accepts multi-transform PARTITIONED BY with bucket") {
    val root = tmpDir("graft-hp-ddl")
    spark.sql(
      s"""CREATE TABLE graft.`$root` (url STRING, warc_ts TIMESTAMP, n BIGINT)
         |PARTITIONED BY (bucket(16, url), days(warc_ts))""".stripMargin)
    val t = GraftTable.load(spark, root)
    assert(t.partitionSpecs.map(_.toString) === Seq("bucket(16, url)", "days(warc_ts)"))
    spark.sql(s"INSERT INTO graft.`$root` VALUES ('https://a.example/1', TIMESTAMP'2025-01-02 03:04:05', 1)")
    val f = t.files()
    assert(f.nonEmpty && f.forall(p => p.path.contains("gp_bucket_16_url=") &&
      p.path.contains("gp_days_warc_ts=2025-01-02")))
  }

  test("invalid specs are rejected at create") {
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("graft-hp-bad3"), Synth.pageSchema,
        Map(PartitionSpec.Property -> "bucket(0, url)")) // bucket count < 1
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("graft-hp-bad4"), Synth.pageSchema,
        Map(PartitionSpec.Property -> "days(html)")) // not a time column
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("graft-hp-bad5"), Synth.pageSchema,
        Map(PartitionSpec.Property -> "truncate(4, warc_ts)")) // not string/integral
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("graft-hp-bad"), Synth.pageSchema,
        Map(PartitionSpec.Property -> "days(nope)"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("graft-hp-bad2"), Synth.pageSchema,
        Map(PartitionSpec.Property -> "buckets(16, url)"))
    }
  }

  test("partition-spec evolution: both generations prune; maintenance never mixes them") {
    val t = GraftTable.create(spark, tmpDir("graft-hp-evolve"), Synth.pageSchema,
      Map(PartitionSpec.Property -> "bucket(4, url)"))
    t.append(Synth.pages(spark, 2000, hosts = 20, partitions = 4))
    val gen1 = t.files().map(_.path).toSet
    assert(gen1.forall(_.contains("gp_bucket_4_url=")))

    // evolve bucket(4) → bucket(16): no data rewrite, layout changes forward
    spark.sql(s"ALTER TABLE graft.`${t.root}` SET PARTITION SPEC (bucket(16, url))")
    assert(t.partitionSpecs.map(_.toString) === Seq("bucket(16, url)"))
    assert(t.allPartitionSpecs.map(_.toString).toSet ===
      Set("bucket(16, url)", "bucket(4, url)"))
    t.append(Synth.pages(spark, 2000, hosts = 20, partitions = 4, seed = 9)
      .withColumn("url", concat(col("url"), lit("?g=2"))))
    val files = t.files()
    val gen2 = files.map(_.path).toSet -- gen1
    assert(gen2.nonEmpty && gen2.forall(_.contains("gp_bucket_16_url=")),
      "new writes must lay out under the NEW spec")

    // equality pruning hits BOTH generations through each file's own spec
    val u1 = t.read().filter(!col("url").endsWith("?g=2"))
      .select("url").orderBy("url").head().getString(0)
    val planned1 = t.planFiles(Some(col("url") === lit(u1)))
    assert(planned1.size < files.size / 2,
      s"old-generation bucket(4) dirs must still prune: ${planned1.size}/${files.size}")
    val u2 = t.read().filter(col("url").endsWith("?g=2"))
      .select("url").orderBy("url").head().getString(0)
    val planned2 = t.planFiles(Some(col("url") === lit(u2)))
    assert(planned2.size < files.size / 2,
      s"new-generation bucket(16) dirs must prune: ${planned2.size}/${files.size}")
    assertSameRows(t.read(Some(col("url") === lit(u1))),
      t.read().filter(col("url") === lit(u1)), "evolved-spec pruned scan")

    // maintenance groups by each file's OWN generation: no rewrite group
    // may span bucket(4) and bucket(16) files
    val specs = t.allPartitionSpecs
    val groups = files.groupBy(f => PartitionSpec.fileKey(specs, f))
    for ((k, fs) <- groups) {
      val gens = fs.map(f => f.path.contains("gp_bucket_4_url=")).toSet
      assert(gens.size == 1, s"group $k mixes spec generations")
    }
    // compaction migrates rewritten groups to the ACTIVE layout
    val preCount = t.read().count()
    graft.ops.Compact.run(t, targetBytes = 256L * 1024 * 1024)
    assert(t.read().count() === preCount)
    assertSameRows(t.read(Some(col("url") === lit(u1))),
      t.read().filter(col("url") === lit(u1)), "post-compaction pruned scan")

    // DROP PARTITION SPEC unpartitions; history keeps old dirs pruning
    spark.sql(s"ALTER TABLE graft.`${t.root}` DROP PARTITION SPEC")
    assert(t.partitionSpecs.isEmpty && t.allPartitionSpecs.nonEmpty)
    assert(t.read().count() === preCount)
  }
}
