package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField}

import graft.SparkSuite
import graft.run.Synth

/** Snapshot rollback + add-only schema evolution. */
class EvolutionSpec extends SparkSuite {

  private def batch(tag: String, n: Int) =
    Synth.pages(spark, n, hosts = 5, partitions = 2)
      .withColumn("url", concat(lit(s"$tag/"), col("url")))

  test("rollback moves the pointer without touching data") {
    val tbl = GraftTable.create(spark, tmpDir("rollback"), Synth.pageSchema)
    val s1 = tbl.append(batch("a", 200)).id
    val s2 = tbl.append(batch("b", 100)).id
    assert(tbl.read().count() === 300)

    tbl.rollback(s1)
    assert(tbl.read().count() === 200)
    assert(tbl.currentSnapshot.map(_.id).contains(s1))
    // the abandoned snapshot stays readable (redo = roll forward)
    assert(tbl.readSnapshot(s2).count() === 300)
    tbl.rollback(s2)
    assert(tbl.read().count() === 300)

    // post-rollback commits get fresh, monotonic snapshot ids
    tbl.rollback(s1)
    val s3 = tbl.append(batch("c", 50)).id
    assert(s3 > s2)
    assert(tbl.read().count() === 250)
    assert(intercept[IllegalArgumentException](tbl.rollback(999L))
      .getMessage.contains("unknown or expired"))
  }

  test("added nullable column reads as NULL from old files, real from new") {
    val tbl = GraftTable.create(spark, tmpDir("addcol"), Synth.pageSchema)
    tbl.append(batch("a", 150))
    tbl.addColumn(StructField("score", DoubleType, nullable = true))

    val afterAdd = tbl.read()
    assert(afterAdd.schema.fieldNames.contains("score"))
    assert(afterAdd.filter(col("score").isNull).count() === 150)

    tbl.append(batch("b", 60).withColumn("score", lit(0.5)))
    val mixed = tbl.read()
    assert(mixed.count() === 210)
    assert(mixed.filter(col("score").isNull).count() === 150)
    assert(mixed.filter(col("score") === 0.5).count() === 60)

    // pruning on the new column must not drop old (stat-less) files
    assert(tbl.read(Some(col("score").isNull)).count() === 150)
    assert(tbl.planFiles(Some(col("score") === 0.5)).nonEmpty)

    // guard rails
    assert(intercept[IllegalArgumentException](
      tbl.addColumn(StructField("score", DoubleType))).getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException](
      tbl.addColumn(StructField("req", DoubleType, nullable = false)))
      .getMessage.contains("nullable"))
  }
}
