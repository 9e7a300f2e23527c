package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth

/** Typed Dataset facade over the table scan. */
class TypedReadSpec extends SparkSuite {

  test("readAs[PageRow] round-trips with pruning intact") {
    import spark.implicits._
    val tbl = GraftTable.create(spark, tmpDir("typed"), Synth.pageSchema)
    tbl.append(Synth.pages(spark, 500, hosts = 4, partitions = 2))

    val ds = tbl.readAs[PageRow]()
    assert(ds.count() === 500)
    val one = ds.orderBy("url").head()
    assert(one.url.startsWith("https://host-"))
    assert(one.html.nonEmpty && one.text.nonEmpty)

    // typed transforms compose with the pruned scan
    val de = tbl.readAs[PageRow](Some(col("lang") === "de"))
      .map(p => p.url -> p.text.length)
    assert(de.count() === tbl.read().filter(col("lang") === "de").count())
  }

  test("metadata tables expose history and file inventory") {
    val tbl = GraftTable.create(spark, tmpDir("metatables"), Synth.pageSchema)
    tbl.append(Synth.pages(spark, 200, hosts = 4, partitions = 2))
    tbl.append(Synth.pages(spark, 100, hosts = 4, partitions = 1, seed = 9))

    val snaps = tbl.snapshotsDf
    assert(snaps.count() === 2)
    assert(snaps.filter(col("operation") === "append").count() === 2)
    assert(snaps.agg(max("rows")).head().getLong(0) === 300)

    val files = tbl.filesDf()
    assert(files.count() === tbl.files().size.toLong)
    assert(files.agg(sum("rows")).head().getLong(0) === 300)
    // bounds are queryable (e.g. find files overlapping a lang)
    assert(files.filter(element_at(col("min_values"), "lang") <= "de" &&
      element_at(col("max_values"), "lang") >= "de").count() >= 1)
  }
}
