package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.run.Synth

/**
 * Truth table for stats-based pruning, mirroring the spirit of the
 * reference's 3-valued ConditionTreeManagerTest
 * (`SchemaExplorer/src/test/java/org/gstn/schemaexplorer/sql/ConditionTreeManagerTest.java:38-655`):
 * here "null" means "stats cannot decide", and pruning must never drop a
 * file that could match (soundness), while dropping provable non-matches.
 */
class PredicatePruneSpec extends SparkSuite {

  private val schema = Synth.pageSchema
  private def meta(min: String, max: String, nulls: Long = 0, rows: Long = 100) =
    DataFileMeta("f", rows, 1000,
      Map("lang" -> min, "url" -> "https://a.com/1", "text" -> "a"),
      Map("lang" -> max, "url" -> "https://z.org/9", "text" -> "z"),
      Map("lang" -> nulls, "url" -> 0L, "text" -> 0L), "u")

  private def eval(pred: org.apache.spark.sql.Column, m: DataFileMeta): Option[Boolean] = {
    spark // ensure active session
    PredicatePrune.evalFile(PredicatePrune.resolve(spark, schema, pred), m, schema)
  }

  test("equality against bounds") {
    val m = meta("de", "fr")
    assert(eval(col("lang") === "en", m) == None)          // inside range → maybe
    assert(eval(col("lang") === "zh", m) == Some(false))   // above max → never
    assert(eval(col("lang") === "aa", m) == Some(false))   // below min → never
    assert(eval(lit("zh") === col("lang"), m) == Some(false)) // commuted
  }

  test("ranges with null-awareness") {
    val m = meta("de", "fr")
    assert(eval(col("lang") > "fr", m) == Some(false))
    assert(eval(col("lang") >= "fr", m) == None)
    assert(eval(col("lang") < "de", m) == Some(false))
    assert(eval(col("lang") <= "cz", m) == Some(false))
    assert(eval(col("lang") > "aa", m) == Some(true))      // whole file matches, no nulls
    val withNulls = meta("de", "fr", nulls = 5)
    assert(eval(col("lang") > "aa", withNulls) == None)    // null rows don't match
  }

  test("AND/OR three-valued combination") {
    val m = meta("de", "fr")
    assert(eval(col("lang") === "en" && col("lang") === "zh", m) == Some(false))
    assert(eval(col("lang") === "en" || col("lang") === "zh", m) == None)
    assert(eval(col("lang") === "zh" || col("lang") === "aa", m) == Some(false))
    assert(eval(col("lang") > "aa" || col("lang") === "zh", m) == Some(true))
    // unknown arm keeps AND undecided, not false
    assert(eval(length(col("text")) > 2 && col("lang") === "en", m) == None)
    assert(eval(length(col("text")) > 2 && col("lang") === "zh", m) == Some(false))
  }

  test("NOT flips decidable outcomes only") {
    val m = meta("de", "fr")
    assert(eval(!(col("lang") === "zh"), m) == Some(true))
    assert(eval(!(col("lang") === "en"), m) == None)
  }

  test("IN list") {
    val m = meta("de", "fr")
    assert(eval(col("lang").isin("aa", "zh"), m) == Some(false))
    assert(eval(col("lang").isin("aa", "en"), m) == None)
  }

  test("IS NULL / IS NOT NULL from null counts") {
    assert(eval(col("lang").isNull, meta("de", "fr", nulls = 0)) == Some(false))
    assert(eval(col("lang").isNull, meta("de", "fr", nulls = 100, rows = 100)) == Some(true))
    assert(eval(col("lang").isNull, meta("de", "fr", nulls = 3)) == None)
    assert(eval(col("lang").isNotNull, meta("de", "fr", nulls = 0)) == Some(true))
  }

  test("startsWith prefix pruning (rowkey-prefix scan analog)") {
    val m = meta("de", "fr") // url range [https://a.com/1, https://z.org/9]
    assert(eval(col("url").startsWith("https://"), m) == None)
    assert(eval(col("url").startsWith("http://"), m) == Some(false))  // all urls above
    assert(eval(col("url").startsWith("i-past-z"), m) == Some(false)) // all urls below
  }

  test("monotonic-transform predicates prune through raw bounds") {
    // file covering 2025-01-01T06:00Z .. 2025-01-02T18:00Z (micros)
    def day(d: Int, h: Int = 0) = (1735689600L + d * 86400L + h * 3600L) * 1000000L
    val m = DataFileMeta("f", 100, 1000,
      Map("warc_ts" -> day(0, 6).toString, "lang" -> "de"),
      Map("warc_ts" -> day(1, 18).toString, "lang" -> "fr"),
      Map("warc_ts" -> 0L, "lang" -> 0L), "u")
    def d(s: String) = lit(java.sql.Date.valueOf(s))
    // to_date(ts) = D: outside [Jan 1, Jan 2] → provably empty
    assert(eval(to_date(col("warc_ts")) === d("2025-01-05"), m) == Some(false))
    assert(eval(to_date(col("warc_ts")) === d("2024-12-31"), m) == Some(false))
    assert(eval(to_date(col("warc_ts")) === d("2025-01-02"), m) == None) // maybe
    // whole-file true: every row's day >= Jan 1 and no nulls
    assert(eval(to_date(col("warc_ts")) >= d("2025-01-01"), m) == Some(true))
    // date_trunc keeps timestamp type
    assert(eval(date_trunc("DAY", col("warc_ts")) >
      lit(java.sql.Timestamp.valueOf("2025-01-02 00:00:00")), m) == Some(false))
    // year(): chained Cast(ts→date) → Year
    assert(eval(year(col("warc_ts")) === 2026, m) == Some(false))
    assert(eval(year(col("warc_ts")) === 2025, m) == Some(true)) // all rows in 2025, no nulls
    // epoch-seconds cast
    assert(eval(col("warc_ts").cast("long") < lit(1735689600L), m) == Some(false))
    // NON-monotonic transforms must never prune (month wraps at year ends)
    assert(eval(month(col("warc_ts")) === 5, m) == None)
    assert(eval(hour(col("warc_ts")) === 3, m) == None)
  }

  test("unsupported shapes degrade to unknown (sound, never prune)") {
    val m = meta("de", "fr")
    assert(eval(length(col("lang")) === 2, m) == None)
    assert(eval(xxhash64(col("lang")) > 0, m) == None)
    // missing stats column → unknown
    val noStats = DataFileMeta("f", 10, 100, Map.empty, Map.empty, Map.empty, "u")
    assert(eval(col("lang") === "en", noStats) == None)
  }
}
