package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RangeBucket

/**
 * Single-scan range partitioning on a Long key.
 *
 * `Dataset.repartitionByRange` executes the FULL child plan twice: once for
 * the RangePartitioner's reservoir sample (materializing every column —
 * for a web-page table that means re-reading ~95% of the bytes just to see
 * the keys) and once for the real exchange. At 100 TB that extra pass is
 * the single largest avoidable cost in a clustering rewrite.
 *
 * This implementation:
 *  1. samples ONLY the key expression (column-pruned scan of the key's
 *     source columns) and computes equi-depth boundaries on the driver;
 *  2. assigns each row its range bucket with a codegen'd binary search
 *     ([[RangeBucket]]);
 *  3. steers bucket i into shuffle partition i exactly, through the
 *     standard hash exchange: for each target partition we precompute an
 *     integer token whose Murmur3 hash lands there (`pmod(hash(token), n)`
 *     == i), map bucket → token, and `repartition(n, token)`. The exchange
 *     is Catalyst's own HashPartitioning — no custom physical node, full
 *     codegen, AQE-compatible — but with deterministic placement.
 *
 * Net: one scan of the data instead of two.
 */
object RangeShuffle {

  /** Murmur3(int, seed=42) as used by Catalyst's Murmur3Hash for Int. */
  private def murmurInt(v: Int): Int =
    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)

  /** token(i): smallest non-negative int whose hash lands in partition i. */
  private[ops] def tokens(n: Int): Array[Int] = {
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var cand = 0
    while (remaining > 0) {
      val p = ((murmurInt(cand) % n) + n) % n
      if (!found(p)) { found(p) = true; out(p) = cand; remaining -= 1 }
      cand += 1
    }
    out
  }

  /** Equi-depth upper boundaries (n-1 of them) from a sample of `key`. */
  def boundaries(df: DataFrame, key: Column, n: Int, approxRows: Long,
      samplesPerPartition: Int = 400): Array[Long] = {
    if (n <= 1) return Array.empty
    val fraction = math.min(1.0,
      (n.toLong * samplesPerPartition).toDouble / math.max(1L, approxRows))
    val sample = df.select(key.cast("long").as("k"))
      .sample(withReplacement = false, fraction, seed = 42)
      .collect().map(_.getLong(0))
    java.util.Arrays.sort(sample)
    if (sample.isEmpty) return Array.empty
    (1 until n).map { i =>
      sample(math.min(sample.length - 1, i * sample.length / n))
    }.distinct.toArray
  }

  /**
   * Equi-depth boundaries WITHOUT any scan: per-file [min,max] key bounds
   * from table metadata, each file contributing row-weighted interpolated
   * points. Approximate (assumes roughly uniform keys within a file) but
   * free — right for cases where even a key-only sample would re-execute
   * an expensive child (e.g. the MERGE full-outer join).
   */
  def boundariesFromFileMeta(
      files: Seq[graft.table.DataFileMeta],
      colName: String,
      n: Int,
      key: String => Long,
      pointsPerFile: Int = 8): Array[Long] = {
    if (n <= 1) return Array.empty
    val pts = files.flatMap { f =>
      for {
        lo <- f.minValues.get(colName)
        hi <- f.maxValues.get(colName)
      } yield (key(lo), key(hi), f.rows)
    }
    if (pts.isEmpty) return Array.empty
    val avgRows = math.max(1L, pts.map(_._3).sum / pts.length)
    val samples = pts.flatMap { case (lo, hi, rows) =>
      val k = math.max(2, (pointsPerFile * rows / avgRows).toInt)
      // interpolate in DOUBLE: `hi - lo` overflows Long when the encoded
      // key space spans most of the Long range — exactly what the
      // sortable-bits double encoding produces for a file whose bounds
      // straddle zero (lo ≈ -4.6e18, hi ≈ +4.6e18). Precision loss is
      // fine (equi-depth boundaries are a heuristic); overflow is not.
      val span = hi.toDouble - lo.toDouble
      (0 until k).map(i => lo + (span * i / (k - 1)).toLong)
    }.sorted.toIndexedSeq
    (1 until n).map(i => samples(math.min(samples.length - 1, i * samples.length / n)))
      .distinct.toArray
  }

  /**
   * Range-repartition `df` into (boundaries.length + 1) partitions by `key`
   * and sort each partition by `sortKey`. Rows with equal keys stay
   * together (ties are not split — use a salted key for pathological skew).
   */
  def byRange(df: DataFrame, key: Column, bounds: Array[Long]): DataFrame = {
    val n = bounds.length + 1
    if (n == 1) return df.coalesce(1)
    val tok = tokens(n)
    val bucket = RangeBucket(key, bounds)
    df.withColumn("_rs_tok", element_at(typedLit(tok.toSeq), bucket + 1))
      .repartition(n, col("_rs_tok"))
      .drop("_rs_tok")
  }
}
