package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.table.{FileIO, GraftTable, PartitionSpec}

/** SQL DDL lifecycle: CREATE TABLE (with hidden-partitioning transforms),
  * CTAS, DROP TABLE — plus the statements composing end to end. */
class SqlDdlSpec extends SparkSuite {

  private def freshPath(prefix: String): String = tmpDir(prefix)

  test("CREATE TABLE with PARTITIONED BY (days(col)) declares hidden partitioning") {
    val path = freshPath("sqlddl")
    spark.sql(
      s"""CREATE TABLE graft.`$path` (
         |  url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
         |PARTITIONED BY (days(warc_ts))""".stripMargin).collect()
    val t = GraftTable.load(spark, path)
    assert(t.schema.fieldNames.toSeq === Seq("url", "warc_ts", "html", "text", "lang"))
    assert(t.partitionSpec.map(_.toString).contains("days(warc_ts)"))
    // insert through SQL lands day-grouped files
    spark.sql(
      s"""INSERT INTO graft.`$path`
         |SELECT concat('https://h.example.com/p/', id),
         |       TIMESTAMP '2026-01-01 00:00:00' + make_interval(0, 0, 0, CAST(id % 3 AS INT)),
         |       CAST('x' AS BINARY), concat('text ', id), 'en'
         |FROM range(60)""".stripMargin).collect()
    assert(t.read().count() === 60)
    assert(t.files().forall(_.path.contains("gp_days_warc_ts=")))
    assert(t.files().size >= 3, "three days → at least three files")
    // CREATE over an existing table fails; IF NOT EXISTS is a no-op
    intercept[Exception](spark.sql(s"CREATE TABLE graft.`$path` (x INT)").collect())
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$path` (x INT)").collect()
    assert(t.read().count() === 60, "IF NOT EXISTS must not touch the table")
  }

  test("CTAS creates and fills in one statement") {
    val src = freshPath("sqlddl-src")
    spark.sql(
      s"""CREATE TABLE graft.`$src` AS
         |SELECT id AS k, concat('v', id) AS v FROM range(25)""".stripMargin).collect()
    val t = GraftTable.load(spark, src)
    assert(t.read().count() === 25)
    assert(t.currentSnapshot.get.summary.get("via").contains("sql-ctas"))
    assert(spark.sql(s"SELECT sum(k) FROM graft.`$src`").head().getLong(0) === 300L)
  }

  test("DROP TABLE removes the tree; IF EXISTS tolerates absence") {
    val path = freshPath("sqlddl-drop")
    spark.sql(s"CREATE TABLE graft.`$path` (k BIGINT, v STRING)").collect()
    assert(FileIO.exists(s"$path/metadata/v1.json"))
    spark.sql(s"DROP TABLE graft.`$path`").collect()
    assert(!FileIO.exists(s"$path/metadata/v1.json"))
    intercept[Exception](spark.sql(s"DROP TABLE graft.`$path`").collect())
    spark.sql(s"DROP TABLE IF EXISTS graft.`$path`").collect() // no-op
  }

  test("unsupported DDL shapes fail with clear errors") {
    val path = freshPath("sqlddl-bad")
    val ex = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`$path` (k INT) USING parquet").collect())
    assert(ex.getMessage.contains("graft format"), ex.getMessage)
    val ex2 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`$path` (k INT, ts TIMESTAMP) PARTITIONED BY (days(k))").collect())
    assert(ex2.getMessage.contains("timestamp/date"), ex2.getMessage)
    val _ = PartitionSpec // referenced for doc purposes
  }

  test("DESCRIBE, SHOW TBLPROPERTIES, SET/UNSET TBLPROPERTIES") {
    val path = freshPath("sqlddl-desc")
    spark.sql(
      s"""CREATE TABLE graft.`$path` (url STRING, warc_ts TIMESTAMP, text STRING)
         |PARTITIONED BY (bucket(4, url))""".stripMargin)

    val desc = spark.sql(s"DESCRIBE graft.`$path`").collect()
    assert(desc.map(_.getString(0)).take(3).toSeq === Seq("url", "warc_ts", "text"))
    assert(desc.exists(r => r.getString(0) == "Part 0" && r.getString(1) == "bucket(4, url)"))
    val ext = spark.sql(s"DESCRIBE EXTENDED graft.`$path`").collect()
    assert(ext.exists(r => r.getString(0) == "Provider" && r.getString(1) == "graft"))
    assert(ext.exists(_.getString(0) == "Location"))

    spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES ('team' = 'pipeline', 'tier' = 'gold')")
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$path`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("team") == "pipeline" && props("tier") == "gold")
    assert(props.contains("partition-spec"), "engine properties visible in SHOW")

    spark.sql(s"ALTER TABLE graft.`$path` UNSET TBLPROPERTIES ('tier')")
    val after = spark.sql(s"SHOW TBLPROPERTIES graft.`$path`").collect().map(_.getString(0))
    assert(!after.contains("tier") && after.contains("team"))
    assert(intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$path` UNSET TBLPROPERTIES ('nope')").collect())
      .getMessage.contains("does not exist"))

    // engine-managed keys are protected (dedicated statements exist)
    assert(intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$path` SET TBLPROPERTIES ('partition-spec' = 'bucket(2, url)')").collect())
      .getMessage.contains("engine-managed"))
    assert(intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$path` UNSET TBLPROPERTIES ('next-field-id')").collect())
      .getMessage.contains("engine-managed"))

    // DESCRIBE ... PARTITION must fail loudly, never degrade to plain DESCRIBE
    assert(intercept[Exception](spark.sql(
      s"DESCRIBE graft.`$path` PARTITION (url = 'x')").collect())
      .getMessage.contains("PARTITION is not supported"))
  }
}
