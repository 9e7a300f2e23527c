package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Mirrors the reference's 3-valued predicate semantics
 * (`sql/ConditionTreeManagerTest.java:38-655`) where they intersect Spark
 * SQL, and DOCUMENTS the one deliberate divergence (SURVEY §5): the
 * reference spells null tests as string comparisons against the literal
 * "null" (missing column `= "null"` ⇒ true, `:88`; `!= "null"` ⇒ false,
 * `:90`); this engine uses real SQL NULL semantics (`IS NULL`) and does
 * not copy the stringly-typed quirk.
 */
class NullSemanticsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("B2B"), Some(5)),
    (2L, None, Some(7)),       // rec_type missing
    (3L, Some("B2BA"), None)   // tax missing
  ).toDF("id", "rec_type", "tax")

  test("null checks: IS NULL replaces the reference's = \"null\" idiom") {
    // reference: rec_type = "null" on a missing column evaluates TRUE
    assert(df.filter($"rec_type".isNull).select("id").as[Long].collect().toSeq == Seq(2L))
    // reference: != "null" on a missing column evaluates FALSE
    assert(df.filter($"rec_type".isNotNull).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // the literal comparison does NOT match missing values in SQL (divergence):
    assert(df.filter($"rec_type" === "null").count() == 0)
  }

  test("three-valued short-circuits match the reference's evaluator") {
    // AND false wins over unknown (ConditionTreeManager short-circuit)
    assert(df.filter($"tax" > 100 && $"rec_type" === "B2B").count() == 0)
    // OR true wins over unknown: row 3 has tax NULL but rec_type matches
    assert(df.filter($"tax" > 6 || $"rec_type" === "B2BA")
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // unknown propagates: NULL comparison keeps the row OUT of both a
    // predicate and its negation — must use IS NULL to see it
    val p = $"tax" > 6
    val matched = df.filter(p).count()
    val negated = df.filter(!p).count()
    assert(matched + negated == 2 && df.count() == 3,
      "row with NULL tax is in neither branch (3-valued logic)")
  }

  test("reference operator set maps onto Column algebra incl. REGEXP") {
    val d = Seq(("B2B", "RD0906"), ("B2BA", "XX1"), ("B2C", "RD09")).toDF("rec_type", "inum")
    // sql.g4:101-107 operators: = <= >= < > <> != REGEXP NOT-REGEXP
    assert(d.filter($"rec_type" =!= "B2B").count() == 2)
    assert(d.filter($"inum".rlike("^RD09")).count() == 2)
    assert(d.filter(!$"inum".rlike("^RD09")).count() == 1)
    assert(d.filter($"rec_type" >= "B2B" && $"rec_type" <= "B2C").count() == 3)
  }
}
