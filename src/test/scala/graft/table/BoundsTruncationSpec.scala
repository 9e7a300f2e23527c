package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** String stat truncation: bounds stay sound (only widen) and manifests stay
  * O(bytes) per file even with document-sized string columns. */
class BoundsTruncationSpec extends SparkSuite {

  test("truncated bounds bracket the original value") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val len = 1 + rnd.nextInt(120)
      val s = new String(Array.fill(len)((rnd.nextInt(0x70) + 0x20).toChar))
      val lo = Bounds.truncatedMin(StringType, s)
      val hi = Bounds.truncatedMax(StringType, s)
      assert(Bounds.compare(StringType, lo, s) <= 0, s"min must not exceed value: '$lo' vs '$s'")
      assert(Bounds.compare(StringType, hi, s) >= 0, s"max must not undercut value: '$hi' vs '$s'")
      assert(lo.length <= Bounds.StatsTruncateLen)
      assert(hi.length <= math.max(Bounds.StatsTruncateLen, s.length))
    }
    // short strings pass through untouched
    assert(Bounds.truncatedMin(StringType, "abc") === "abc")
    assert(Bounds.truncatedMax(StringType, "abc") === "abc")
    // non-incrementable prefix falls back to the full value (still sound)
    val high = "ÿ".repeat(40)
    assert(Bounds.truncatedMax(StringType, high) === high)
    // non-string types never truncate
    assert(Bounds.truncatedMax(LongType, "123456") === "123456")
  }

  test("truncation never splits a surrogate pair") {
    // a 4-byte code point (surrogate pair in UTF-16) straddling the cut:
    // naive substring leaves a lone high surrogate whose UTF-8/JSON
    // round-trip is encoder-defined
    val emoji = new String(Character.toChars(0x1F600)) // two UTF-16 chars
    val L = Bounds.StatsTruncateLen
    val straddling = "a" * (L - 1) + emoji + "tail-tail-tail"
    val lo = Bounds.truncatedMin(StringType, straddling)
    assert(lo === "a" * (L - 1), "cut must back off before the high surrogate")
    assert(Bounds.compare(StringType, lo, straddling) <= 0)
    // round-trips losslessly through UTF-8 (no replacement chars)
    assert(new String(lo.getBytes("UTF-8"), "UTF-8") === lo)
    val hi = Bounds.truncatedMax(StringType, straddling)
    assert(Bounds.compare(StringType, hi, straddling) >= 0)
    assert(new String(hi.getBytes("UTF-8"), "UTF-8") === hi)
    // pair fully inside the prefix is kept intact
    val inside = "a" * (L - 2) + emoji + "tail"
    val lo2 = Bounds.truncatedMin(StringType, inside)
    assert(lo2.endsWith(emoji) && lo2.length === L)
    assert(new String(lo2.getBytes("UTF-8"), "UTF-8") === lo2)
  }

  test("document-sized text columns yield small manifests and sound pruning") {
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("text", StringType)))
    val tbl = GraftTable.create(spark, tmpDir("trunc"), schema)
    // ~5 KB texts: beyond parquet's ~4 KB stat cap, where chunk stats would
    // be DROPPED entirely without write-time truncation
    // (parquet.statistics.truncate.length in writeDataFiles) — this test
    // proves document-sized strings still carry prunable bounds
    val doc = (tag: String) => spark.range(50).select(
      concat(lit(s"https://$tag/"), col("id")).as("url"),
      concat(lit(tag * 40), lit(" "), col("id"),
        lit(" lorem ipsum ".repeat(400))).as("text"))
    tbl.append(doc("alpha").repartition(2))
    tbl.append(doc("zeta").repartition(2))

    val metas = tbl.files()
    for (m <- metas; v <- m.minValues.values ++ m.maxValues.values)
      assert(v.length <= Bounds.StatsTruncateLen,
        s"manifest bound longer than truncation limit: ${v.length} chars")

    // pruning on the truncated column still skips the other commit's files
    val planned = tbl.planFiles(Some(col("text").startsWith("alpha")))
    assert(planned.size < metas.size, "startsWith should prune zeta files")
    assert(tbl.read(Some(col("text").startsWith("alpha"))).count() === 50)
    // equality inside vs outside the truncated range
    assert(tbl.read(Some(col("text") >= "zeta")).count() === 50)
    assert(tbl.read(Some(col("text") < "a")).count() === 0)
  }
}
