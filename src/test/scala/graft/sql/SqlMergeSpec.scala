package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth
import graft.table.GraftTable

/** SQL `MERGE INTO graft.`<path>`` — the reference's user-facing merge
  * surface (`hive/HiveTableIR.java:234-302` generates HiveQL merge scripts)
  * re-expressed through Spark's parser + a resolution rule that plans into
  * `Merge.into`. */
class SqlMergeSpec extends SparkSuite {

  private def mk(n: Long): GraftTable = {
    val t = GraftTable.create(spark, tmpDir("sqlmerge"), Synth.pageSchema)
    t.append(Synth.pages(spark, n, hosts = 10, partitions = 4))
    t
  }

  test("MERGE upserts: UPDATE SET * + INSERT *") {
    val t = mk(500)
    val preSnap = t.currentSnapshot.get.id
    // changes: 20 updates (same url, new text) + 10 inserts (new urls)
    val updates = t.read().orderBy("url").limit(20)
      .withColumn("text", lit("SQLUPDATED"))
    val inserts = Synth.pages(spark, 10, hosts = 3, partitions = 1, seed = 321)
      .withColumn("url", concat(lit("https://brand-new.example.com/p/"), monotonically_increasing_id()))
    updates.unionByName(inserts).createOrReplaceTempView("changes")

    val res = spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING changes s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(res.length == 1, "statement returns the committed snapshot id")

    assert(t.read().count() === 510)
    assert(t.read().filter(col("text") === "SQLUPDATED").count() === 20)
    assert(t.read().filter(col("url").startsWith("https://brand-new.")).count() === 10)
    // snapshot isolation: pre-merge snapshot unchanged
    assert(t.readSnapshot(preSnap).count() === 500)
    assert(t.currentSnapshot.get.operation === "merge")
  }

  test("MERGE with conditional DELETE clause") {
    val t = mk(300)
    t.read().orderBy("url").limit(30)
      .withColumn("op", when(col("url").substr(-1, 1).isin("0", "1", "2"), "D").otherwise("U"))
      .withColumn("text", lit("CHANGED"))
      .createOrReplaceTempView("changes2")
    val nDel = spark.table("changes2").filter(col("op") === "D").count()
    assert(nDel > 0)

    spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING changes2 s ON t.url = s.url
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(t.read().count() === 300 - nDel)
    assert(t.read().filter(col("text") === "CHANGED").count() === 30 - nDel)
  }

  test("MERGE with only UPDATE ignores unmatched source rows") {
    val t = mk(100)
    t.read().limit(5).withColumn("text", lit("U1"))
      .unionByName(Synth.pages(spark, 5, partitions = 1, seed = 77)
        .withColumn("url", concat(lit("https://nowhere.example.com/"), col("url")))
        .withColumn("text", lit("IGNORED")))
      .createOrReplaceTempView("changes3")
    spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING changes3 s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    assert(t.read().count() === 100, "no INSERT clause → no new rows")
    assert(t.read().filter(col("text") === "U1").count() === 5)
    assert(t.read().filter(col("text") === "IGNORED").count() === 0)
  }

  test("delete-only MERGE leaves matched-but-not-deleted rows untouched") {
    val t = mk(200)
    val pre = t.read().withColumn("copy", lit(1)).drop("copy")
    t.read().orderBy("url").limit(40)
      .withColumn("op", when(col("url").substr(-1, 1).isin("0", "4"), "D").otherwise("K"))
      .withColumn("text", lit("MUST-NOT-LAND"))
      .createOrReplaceTempView("delonly")
    val nDel = spark.table("delonly").filter(col("op") === "D").count()
    assert(nDel > 0 && nDel < 40)
    spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING delonly s ON t.url = s.url
         |WHEN MATCHED AND s.op = 'D' THEN DELETE""".stripMargin).collect()
    assert(t.read().count() === 200 - nDel)
    assert(t.read().filter(col("text") === "MUST-NOT-LAND").count() === 0,
      "rows matched by NO clause must not be updated")
    assertSameRows(t.read(),
      pre.join(spark.table("delonly").filter(col("op") === "D").select("url"),
        Seq("url"), "left_anti"), "delete-only merge")
  }

  test("MERGE works on tables without the default version column") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val t = GraftTable.create(spark, tmpDir("sqlmerge-nov"), schema)
    import spark.implicits._
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    Seq((2L, "B!"), (9L, "new")).toDF("id", "name").createOrReplaceTempView("novsrc")
    spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING novsrc s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(t.read().count() === 4)
    assert(t.read().filter(col("id") === 2L).head().getString(1) === "B!")
    // ANSI: duplicate source keys are an error, not an arbitrary pick
    Seq((3L, "x"), (3L, "y")).toDF("id", "name").createOrReplaceTempView("dupsrc")
    val ex = intercept[Exception](spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING dupsrc s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect())
    assert(ex.getMessage.contains("multiple rows"), ex.getMessage)
  }

  test("unsupported shapes fail analysis with a clear message") {
    val t = mk(50)
    t.read().limit(1).createOrReplaceTempView("c4")
    val ex = intercept[Exception](spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING c4 s ON t.url = s.url AND t.lang = s.lang
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(ex.getMessage.contains("graft MERGE INTO"), ex.getMessage)
    val ex2 = intercept[Exception](spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING c4 s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET text = 'x'""".stripMargin))
    assert(ex2.getMessage.contains("graft MERGE INTO"), ex2.getMessage)
    // clause order: a DELETE after an unconditional UPDATE is unreachable —
    // Spark's parser already rejects a non-last unconditional clause, and
    // the rule keeps a defensive check behind it
    val ex3 = intercept[Exception](spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING c4 s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN MATCHED AND s.lang = 'de' THEN DELETE""".stripMargin))
    assert(ex3.getMessage.contains("NON_LAST_MATCHED_CLAUSE_OMIT_CONDITION") ||
      ex3.getMessage.contains("unreachable"), ex3.getMessage)
    // target-side references in the DELETE condition would silently rebind
    // to same-named source columns — rejected
    val ex4 = intercept[Exception](spark.sql(
      s"""MERGE INTO graft.`${t.root}` t USING c4 s ON t.url = s.url
         |WHEN MATCHED AND t.lang = 'de' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(ex4.getMessage.contains("SOURCE columns only"), ex4.getMessage)
  }
}
