package graft.textops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/**
 * Mirrors the reference's JsonAdapterTest scenarios
 * (`HBaseToHive/src/test/java/org/gstn/hbasetohive/adapter/JsonAdapterTest.java:40-376`):
 * nested paths, array-of-objects explode, array-of-scalars, the two-array
 * CARTESIAN product (`:199-242`), and missing columns — reproduced with
 * from_json + chained explode, record sets compared order-insensitively.
 */
class JsonShredSpec extends SparkSuite {
  import spark.implicits._

  private def ddl(s: String) = DataType.fromDDL(s)

  test("nested scalar leaves become columns") {
    val df = Seq("""{"rt":"X","trnovr":5,"inner":{"a":1,"b":"z"}}""").toDF("j")
    val out = JsonShred.shred(df, $"j", ddl("rt STRING, trnovr BIGINT, inner STRUCT<a: BIGINT, b: STRING>"),
      Seq("rt", "trnovr", "inner.a", "inner.b"))
    assert(out.columns.toSeq == Seq("rt", "trnovr", "inner#a", "inner#b"))
    assert(out.as[(String, Long, Long, String)].collect().toSet == Set(("X", 5L, 1L, "z")))
  }

  test("array of objects: one record per element, scalars duplicated") {
    val df = Seq("""{"rt":"R","items":[{"no":1},{"no":2},{"no":3}]}""").toDF("j")
    val out = JsonShred.shred(df, $"j",
      ddl("rt STRING, items ARRAY<STRUCT<no: BIGINT>>"), Seq("rt", "items.no"))
    assert(out.as[(String, Long)].collect().toSet ==
      Set(("R", 1L), ("R", 2L), ("R", 3L)))
  }

  test("array of scalars explodes to the scalar") {
    val df = Seq("""{"id":7,"tags":["a","b"]}""").toDF("j")
    val out = JsonShred.shred(df, $"j", ddl("id BIGINT, tags ARRAY<STRING>"), Seq("id", "tags"))
    assert(out.as[(Long, String)].collect().toSet == Set((7L, "a"), (7L, "b")))
  }

  test("two sibling arrays produce the cartesian product of their records") {
    // the reference's signature case: JsonAdapterTest.java:199-242
    val df = Seq("""{"k":"K","A":[{"x":1},{"x":2}],"B":[{"y":10},{"y":20}]}""").toDF("j")
    val out = JsonShred.shred(df, $"j",
      ddl("k STRING, A ARRAY<STRUCT<x: BIGINT>>, B ARRAY<STRUCT<y: BIGINT>>"),
      Seq("k", "A.x", "B.y"))
    assert(out.as[(String, Long, Long)].collect().toSet ==
      Set(("K", 1L, 10L), ("K", 1L, 20L), ("K", 2L, 10L), ("K", 2L, 20L)))
  }

  test("nested array within array chains explodes") {
    val df = Seq("""{"a":{"b":[{"c":[{"d":1},{"d":2}]},{"c":[{"d":3}]}]}}""").toDF("j")
    val out = JsonShred.shred(df, $"j",
      ddl("a STRUCT<b: ARRAY<STRUCT<c: ARRAY<STRUCT<d: BIGINT>>>>>"), Seq("a.b.c.d"))
    assert(out.as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("missing fields become NULL (reference: target default values)") {
    val df = Seq("""{"rt":"X"}""", """{"rt":"Y","opt":9}""").toDF("j")
    val out = JsonShred.shred(df, $"j", ddl("rt STRING, opt BIGINT"), Seq("rt", "opt"))
    assert(out.as[(String, Option[Long])].collect().toSet ==
      Set(("X", None), ("Y", Some(9L))))
    // reference semantics would substitute a default; SQL uses NULL +
    // coalesce at the edge — the documented divergence (SURVEY §5)
    val defaulted = out.withColumn("opt", coalesce($"opt", lit(-1L)))
    assert(defaulted.as[(String, Long)].collect().toSet == Set(("X", -1L), ("Y", 9L)))
  }

  test("empty arrays keep the row with NULLs (explode_outer semantics)") {
    val df = Seq("""{"rt":"E","items":[]}""").toDF("j")
    val out = JsonShred.shred(df, $"j",
      ddl("rt STRING, items ARRAY<STRUCT<no: BIGINT>>"), Seq("rt", "items.no"))
    assert(out.as[(String, Option[Long])].collect().toSet == Set(("E", None)))
  }
}
