package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic synthetic Common-Crawl-style web-page table
 * (per BASELINE.json `input_hint`: url, warc_ts, html:binary, text, lang).
 *
 * Everything is a pure function of (seed, row id) built from codegen'd
 * column expressions over `spark.range(n)` — no driver-side loops, no
 * Scala UDFs — so generation itself scales linearly with cores and the
 * expected content of any row is recomputable in tests
 * ("byte-identical text per url" is checkable by reconstruction).
 *
 * Skew: hosts follow an approximate Zipf(s) via the Pareto inverse-CDF
 * `k = ceil(u^(-1/(s-1)))`, so host-0 style heavy hitters exist — the
 * analog of the hot HBase regions the reference salts against
 * (`hbase/RowkeyField.java:139-154`).
 */
object Synth {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  val langs: Seq[String] = Seq(
    "en", "zh", "ru", "de", "es", "fr", "ja", "pt", "it", "nl",
    "pl", "tr", "vi", "ko", "ar", "fa", "id", "cs", "sv", "ro",
    "el", "hu", "da", "fi", "uk", "no", "th", "he", "sk", "bg",
    "hr", "lt", "et", "lv", "sl", "sr", "ms", "hi", "bn", "ta")

  private val baseEpochSec = 1735689600L // 2025-01-01T00:00:00Z

  /** Uniform-ish deterministic double in [0,1) from id + salt. */
  private def u(idCol: org.apache.spark.sql.Column, salt: Int, seed: Long) =
    (pmod(xxhash64(idCol, lit(salt), lit(seed)), lit(1000000000L)).cast(DoubleType)) / 1e9

  /**
   * Generate `nUrls * versions` page rows. Version v of a url has a strictly
   * larger warc_ts and different text/html bytes (drives latest-wins MERGE).
   *
   * @param htmlRepeatMax html size ≈ 64B * repeat, repeat in [4, htmlRepeatMax)
   */
  def pages(
      spark: SparkSession,
      nUrls: Long,
      versions: Int = 1,
      hosts: Int = 1000,
      seed: Long = 42L,
      zipfS: Double = 1.2,
      htmlRepeatMax: Int = 64,
      partitions: Int = 0): DataFrame = {
    val n = nUrls * versions
    val base0 = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    val paretoExp = -1.0 / (zipfS - 1.0)
    val df = base0
      .withColumn("urlId", col("id") / versions cast LongType)
      .withColumn("version", pmod(col("id"), lit(versions.toLong)).cast(IntegerType))
      .withColumn("hostId",
        greatest(lit(1L), least(lit(hosts.toLong),
          floor(pow(greatest(u(col("urlId"), 1, seed), lit(1e-9)), paretoExp)))).cast(LongType))
      .withColumn("url",
        concat(lit("https://host-"), col("hostId"), lit(".example.com/p/"), col("urlId")))
      .withColumn("warc_ts",
        timestamp_seconds(lit(baseEpochSec) + pmod(xxhash64(col("urlId"), lit(7), lit(seed)), lit(86400L * 30))
          + col("version") * lit(86400L * 40)))
      .withColumn("lang",
        element_at(lit(langs.toArray),
          (floor(pow(u(col("urlId"), 2, seed), 2.2) * langs.size) + 1).cast(IntegerType)))
      .withColumn("text", textExpr(col("url"), col("version")))
      // html: DISTINCT 32-byte sha blocks, unhexed → incompressible binary
      // (a repeat() of one block would RLE away and make GB/s meaningless)
      .withColumn("html",
        unhex(array_join(transform(
          sequence(lit(1),
            (pmod(xxhash64(col("id"), lit(3), lit(seed)), lit(htmlRepeatMax.toLong - 4)) + 4).cast(IntegerType)),
          i => sha2(concat(col("url"), lit("#"), col("version"), lit("#"), i), 256)), "")))
    df.select("url", "warc_ts", "html", "text", "lang")
  }

  /** The text column as a pure expression of (url, version) — tests rebuild
    * expected text with exactly this. */
  def textExpr(url: org.apache.spark.sql.Column, version: org.apache.spark.sql.Column) =
    repeat(sha2(concat(url, lit("#"), version, lit("#text")), 256),
      (pmod(xxhash64(url, version), lit(12L)) + 2).cast(IntegerType))
}
