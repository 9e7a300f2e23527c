package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** P1 (dynamic-column pattern select, `SqlBean.java:265-345`) and P9
  * (missing-column default fill, `HdfsTargetModel.java:70-75`) — the two
  * reference mappings that previously existed only on paper. */
class RestructureSpec extends SparkSuite {
  import spark.implicits._

  private lazy val wide = Seq((1L, 10.0, 20.0, 30.0, "ok"))
    .toDF("id", "amt_2024_01", "amt_2024_02", "amt_2025_01", "status")

  test("pattern select: unresolved components become a column regex") {
    // <yyyy>/<mm> unresolved → all amt_* columns
    assert(Restructure.selectPattern(wide, "amt_<yyyy>_<mm>").columns.toSeq ===
      Seq("amt_2024_01", "amt_2024_02", "amt_2025_01"))
    // mm bound in "WHERE" → only January columns
    assert(Restructure.selectPattern(wide, "amt_<yyyy>_<mm>", Map("mm" -> "01"))
      .columns.toSeq === Seq("amt_2024_01", "amt_2025_01"))
    // fully instantiated → plain single-column select
    val full = Restructure.selectPattern(wide, "amt_<yyyy>_<mm>",
      Map("yyyy" -> "2024", "mm" -> "02"))
    assert(full.columns.toSeq === Seq("amt_2024_02"))
    assert(full.head().getDouble(0) === 20.0)
    // repeated components substitute everywhere (reference loops the index)
    assert(Restructure.selectPattern(wide, "amt_<d>0<d>4_0<d>", Map("d" -> "2"))
      .columns.toSeq === Seq("amt_2024_02"))
  }

  test("pattern literals are regex-quoted (dots and brackets are literal)") {
    import spark.implicits._
    val dotted = Seq((1.0, 2.0, 3.0)).toDF("price.v2_a", "priceXv2_a", "p(1)_a")
    // '.' must NOT match 'X'
    assert(Restructure.selectPattern(dotted, "price.v2_<m>").columns.toSeq ===
      Seq("price.v2_a"))
    // regex metacharacters in literals must not break compilation
    assert(Restructure.selectPattern(dotted, "p(1)_<m>").columns.toSeq === Seq("p(1)_a"))
  }

  test("pattern select reaches the parquet scan as a pruned projection") {
    val dir = tmpDir("restructure-prune")
    wide.write.parquet(dir)
    val scanned = Restructure.selectPattern(spark.read.parquet(dir), "amt_<yyyy>_<mm>")
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("status"),
      s"unmatched columns must be pruned from the scan:\n$plan")
    assert(scanned.count() === 1)
  }

  test("target restructuring fills missing columns with defaults") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("status", StringType),
      StructField("region", StringType),   // missing in source → default
      StructField("score", DoubleType)))   // missing, no default → NULL
    val out = Restructure.toTargetSchema(
      wide.select("id", "status"), target, Map("region" -> "ZZ"))
    assert(out.columns.toSeq === Seq("id", "status", "region", "score"))
    val r = out.head()
    assert(r.getLong(0) === 1L && r.getString(1) === "ok")
    assert(r.getString(2) === "ZZ", "schema default for missing column")
    assert(r.isNullAt(3), "missing column without default is NULL")
    // present columns cast to the target type (reference reformats dates
    // similarly on restructure)
    val casted = Restructure.toTargetSchema(
      Seq(("5", "x")).toDF("id", "status"), target)
    assert(casted.head().getLong(0) === 5L)
  }
}
