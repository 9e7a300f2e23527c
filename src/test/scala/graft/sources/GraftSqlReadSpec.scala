package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.table.GraftTable

/**
 * SQL front door + planner-driven file skipping: predicates written in plain
 * SQL over a graft table (no engine API in sight) must prune data files via
 * snapshot min/max metadata — the generalization of the reference's
 * key-prefix scan construction (`sql/HQLEngine.java:105-175`) to
 * Catalyst-pushed filters.
 */
class GraftSqlReadSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** one append per lang → every data file has tight lang min/max */
  private def mkTable(root: String): GraftTable = {
    val tbl = GraftTable.create(spark, root, schema)
    for (lang <- Seq("de", "en", "fr")) {
      val df = spark.range(200)
        .select(
          concat(lit(s"https://$lang.site/"), col("id")).as("url"),
          timestamp_seconds(lit(1700000000L) + col("id") * 60).as("warc_ts"),
          concat(lit(s"text-$lang-"), col("id")).as("text"),
          lit(lang).as("lang"))
        .repartition(4)
      tbl.append(df)
    }
    tbl
  }

  private def scanFiles(df: DataFrame): Long = {
    df.collect() // metrics populate on execution
    val scans = df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("format(\"graft\") reads the current snapshot") {
    val root = tmpDir("graft-dsv1")
    mkTable(root)
    val df = spark.read.format("graft").load(root)
    assert(df.count() === 600)
    assert(df.schema.fieldNames.toSeq === Seq("url", "warc_ts", "text", "lang"))
  }

  test("SQL WHERE over a view prunes files from snapshot metadata") {
    val root = tmpDir("graft-sqlprune")
    mkTable(root)
    spark.read.format("graft").load(root).createOrReplaceTempView("pages_sql")

    val all = scanFiles(spark.sql("SELECT url FROM pages_sql"))
    assert(all === 12, s"expected 12 total files, scan saw $all")

    val de = spark.sql("SELECT url, text FROM pages_sql WHERE lang = 'de'")
    assert(de.count() === 200)
    assert(scanFiles(de) === 4, "lang='de' should touch only that append's 4 files")

    // conjunction with an unprunable residual still prunes on the prunable leg
    val mixed = spark.sql(
      "SELECT url FROM pages_sql WHERE lang = 'fr' AND length(text) > 0")
    assert(mixed.count() === 200)
    assert(scanFiles(mixed) === 4)

    // timestamp range: first 10 minutes of the feed = ids 0..9 in every lang
    val ts = spark.sql(
      "SELECT count(*) AS n FROM pages_sql WHERE warc_ts < timestamp'2023-11-14 22:23:20'")
    assert(ts.collect().head.getLong(0) === 3 * 10)
  }

  test("programmatic read() prunes through later .filter calls too") {
    val root = tmpDir("graft-lateprune")
    val tbl = mkTable(root)
    val lazyFiltered = tbl.read().filter(col("lang") === "en").select("url")
    assert(lazyFiltered.count() === 200)
    assert(scanFiles(lazyFiltered) === 4,
      "filter applied after read() must still reach the file index")
  }

  test("snapshot-id option time-travels") {
    val root = tmpDir("graft-timetravel")
    val tbl = mkTable(root)
    val firstSnap = tbl.metadata.snapshots.head.id
    val old = spark.read.format("graft").option("snapshot-id", firstSnap.toString).load(root)
    assert(old.count() === 200)
    assert(old.select("lang").distinct().collect().map(_.getString(0)).toSeq === Seq("de"))
  }

  test("write.format(\"graft\") append and overwrite commit atomically") {
    val root = tmpDir("graft-write")
    val mk = (tag: String) => spark.range(100).select(
      concat(lit(s"https://w/$tag/"), col("id")).as("url"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("warc_ts"),
      concat(lit(tag), col("id")).as("text"),
      lit("en").as("lang"))

    mk("a").write.format("graft").mode("append").save(root) // creates
    mk("b").write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).count() === 200)

    val tbl = GraftTable.load(spark, root)
    val preOverwriteSnap = tbl.currentSnapshot.get.id
    mk("c").write.format("graft").mode("overwrite").save(root)
    val after = spark.read.format("graft").load(root)
    assert(after.count() === 100)
    assert(after.filter(col("text").startsWith("c")).count() === 100)
    // snapshot isolation: the pre-overwrite snapshot remains readable
    val old = spark.read.format("graft")
      .option("snapshot-id", preOverwriteSnap.toString).load(root)
    assert(old.count() === 200)
  }

  test("overwrite-creating a table commits as append (incremental-read friendly)") {
    val root = tmpDir("graft-ow-create")
    spark.range(20).select(
        concat(lit("https://o/"), col("id")).as("url"),
        timestamp_seconds(lit(1700000000L)).as("warc_ts"),
        col("id").cast("string").as("text"), lit("en").as("lang"))
      .write.format("graft").mode("overwrite").save(root)
    val tbl = GraftTable.load(spark, root)
    assert(tbl.currentSnapshot.map(_.operation).contains("append"))
    assert(tbl.incrementalRead(0).count() === 20)
  }

  test("graft scan equals direct parquet scan (row sets)") {
    val root = tmpDir("graft-parity")
    val tbl = mkTable(root)
    val direct = spark.read.schema(schema)
      .parquet(tbl.files().map(tbl.absPath): _*)
    assertSameRows(tbl.read(), direct, "graft relation vs raw parquet")
  }
}
