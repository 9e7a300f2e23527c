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
}
