package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth

/**
 * Write-time clustering: `write.sort-order` sorts each append task's rows
 * and `write.max-records-per-file` rolls the sorted run into bounded files,
 * so new files carry tight min/max bounds on the sort prefix and predicate
 * scans prune WITHOUT a full cluster rewrite.
 */
class WriteSortSpec extends SparkSuite {

  test("sorted+rolled appends prune on the leading sort column; unsorted do not") {
    val data = Synth.pages(spark, 4000, partitions = 4)

    val plain = GraftTable.create(spark, tmpDir("ws-plain"), Synth.pageSchema)
    plain.append(data)

    val sorted = GraftTable.create(spark, tmpDir("ws-sorted"), Synth.pageSchema)
    spark.sql(s"ALTER TABLE graft.`${sorted.root}` SET TBLPROPERTIES (" +
      "'write.sort-order'='lang,url', 'write.max-records-per-file'='300')")
    sorted.append(data)

    // row-preserving
    assertSameRows(sorted.read(), plain.read(), "write-sort scan")
    // rolling produced several files per task, each a sorted run
    assert(sorted.files().size > plain.files().size)
    // tight leading-column bounds: a rolled sorted run covers a SUBRANGE
    // of langs, not the full [min, max] span the unsorted files all carry
    val langLo = sorted.files().flatMap(_.minValues.get("lang")).min
    val langHi = sorted.files().flatMap(_.maxValues.get("lang")).max
    val fullSpan = sorted.files().count(f =>
      f.minValues.get("lang").contains(langLo) && f.maxValues.get("lang").contains(langHi))
    assert(fullSpan < sorted.files().size / 4,
      s"sorted files must carry subrange bounds ($fullSpan/${sorted.files().size} span everything)")
    // the payoff: a lang predicate prunes files on the sorted table and
    // cannot prune anything on the unsorted one
    val pred = col("lang") === "de"
    assert(plain.planFiles(Some(pred)).size == plain.files().size,
      "unsorted appends: every file spans all langs")
    assert(sorted.planFiles(Some(pred)).size < sorted.files().size / 2,
      "sorted appends: lang predicate must skip most files")
    assertSameRows(sorted.read(Some(pred)), plain.read(Some(pred)), "pruned scan equality")
  }

  test("sort-order names missing from the schema are skipped, never fatal") {
    val t = GraftTable.create(spark, tmpDir("ws-missing"), Synth.pageSchema)
    spark.sql(s"ALTER TABLE graft.`${t.root}` SET TBLPROPERTIES (" +
      "'write.sort-order'='nope,lang')")
    t.append(Synth.pages(spark, 200))
    assert(t.read().count() == 200)
  }
}
