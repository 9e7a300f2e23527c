package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Merge
import graft.run.Synth
import graft.table.GraftTable

/** SQL DELETE FROM / UPDATE over graft tables, plus the programmatic
  * updateWhere they plan into — copy-on-write, metadata-pruned, snapshot
  * isolated. */
class SqlDmlSpec extends SparkSuite {

  private def mk(n: Long): GraftTable = {
    val t = GraftTable.create(spark, tmpDir("sqldml"), Synth.pageSchema)
    t.append(Synth.pages(spark, n, hosts = 8, partitions = 4))
    t
  }

  test("DELETE FROM removes matching rows only, snapshot isolated") {
    val t = mk(600)
    val pre = t.read()
    val n = pre.count()
    val nDe = pre.filter(col("lang") === "de").count()
    assert(nDe > 0)
    val preSnap = t.currentSnapshot.get.id
    val res = spark.sql(s"DELETE FROM graft.`${t.root}` WHERE lang = 'de'").collect()
    assert(res.length === 1)
    assert(t.read().count() === n - nDe)
    assert(t.read().filter(col("lang") === "de").count() === 0)
    assert(t.readSnapshot(preSnap).count() === n, "pre-delete snapshot intact")
    assert(t.currentSnapshot.get.operation === "delete")
  }

  test("UPDATE rewrites only matching rows; RHS sees pre-update values") {
    val t = mk(400)
    val pre = t.read()
    val nEn = pre.filter(col("lang") === "en").count()
    assert(nEn > 0 && nEn < 400)
    spark.sql(
      s"""UPDATE graft.`${t.root}`
         |SET text = concat(text, '!'), lang = upper(lang)
         |WHERE lang = 'en'""".stripMargin).collect()
    val post = t.read()
    assert(post.count() === 400, "UPDATE must not change row count")
    assert(post.filter(col("lang") === "EN").count() === nEn)
    assert(post.filter(col("lang") === "en").count() === 0)
    assert(post.filter(col("lang") === "EN" && !col("text").endsWith("!")).count() === 0)
    // untouched rows byte-identical
    assertSameRows(post.filter(col("lang") =!= "EN"),
      pre.filter(col("lang") =!= "en"), "non-matching rows unchanged")
    assert(t.currentSnapshot.get.operation === "update")
  }

  test("DML on an empty (never-appended) table affects 0 rows, no crash") {
    val t = GraftTable.create(spark, tmpDir("sqldml-empty"), Synth.pageSchema)
    assert(spark.sql(s"UPDATE graft.`${t.root}` SET lang = 'x' WHERE lang = 'y'")
      .collect().isEmpty)
    assert(spark.sql(s"DELETE FROM graft.`${t.root}` WHERE lang = 'y'")
      .collect().isEmpty)
    assert(t.currentSnapshot.isEmpty, "no snapshot created by no-op DML")
  }

  test("programmatic updateWhere prunes to touched files") {
    val t = GraftTable.create(spark, tmpDir("updw"), Synth.pageSchema)
    // lang-sorted files → tight lang bounds per file
    t.append(Synth.pages(spark, 2000, partitions = 4)
      .repartitionByRange(8, col("url")).sortWithinPartitions("url"))
    val files = t.files().map(_.path).toSet
    assert(files.size >= 4)
    val one = t.files().head
    val pred = col("url") >= one.minValues("url") && col("url") <= one.maxValues("url")
    Merge.updateWhere(t, pred, Map("text" -> lit("TOUCHED")))
    val after = t.files().map(_.path).toSet
    assert((files intersect after).nonEmpty, "untouched files must survive by reference")
    assert(t.read().filter(col("text") === "TOUCHED").count() ===
      t.read().filter(pred).count())
    // updating an unknown column is rejected
    intercept[IllegalArgumentException] {
      Merge.updateWhere(t, lit(true), Map("nope" -> lit(1)))
    }
  }
}
