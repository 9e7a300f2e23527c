package graft.ops

import org.apache.spark.sql.types.DataType

import graft.table.Bounds

/**
 * Interval-stabbing index over per-file [min, max] key bounds: which files
 * may contain key k?
 *
 * Classic sorted-mins + prefix-max-of-maxes structure: intervals sorted by
 * min bound; prefixMax(i) = max of max-bounds over intervals 0..i. A query
 * binary-searches the last interval with min ≤ k, then walks left emitting
 * matches, stopping as soon as prefixMax < k — below that point NO interval
 * can contain k. Cost is O(log n + w) where w is the size of the contiguous
 * candidate window (= matches on a table without pathological containment
 * nesting), replacing the previous per-key linear scan of every file:
 * at 10^5 files × 10^8 change keys that scan was 10^13 comparisons.
 */
private[graft] final class IntervalIndex(
    dt: DataType,
    intervals: Seq[(String, String, Int)]) extends Serializable {

  private val sorted: Array[(String, String, Int)] =
    intervals.sortWith((a, b) => Bounds.compare(dt, a._1, b._1) < 0).toArray
  private val prefixMax: Array[String] = {
    val out = new Array[String](sorted.length)
    var i = 0
    while (i < sorted.length) {
      out(i) = if (i == 0) sorted(0)._2 else Bounds.max(dt, out(i - 1), sorted(i)._2)
      i += 1
    }
    out
  }

  /** bound-comparison count of the LAST overlapping() call — driver-side
    * test instrumentation only (each executor has its own copy). */
  @transient var lastProbes: Int = 0

  /** Indices (third tuple element) of all intervals containing k. */
  def overlapping(k: String): Seq[Int] = {
    if (sorted.isEmpty) return Seq.empty
    var probes = 0
    // binary search: last index with min <= k
    var lo = 0
    var hi = sorted.length - 1
    var last = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      probes += 1
      if (Bounds.compare(dt, sorted(mid)._1, k) <= 0) { last = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = last
    var continue = i >= 0
    while (continue) {
      probes += 1
      if (Bounds.compare(dt, prefixMax(i), k) < 0) continue = false // nothing further left can reach k
      else {
        probes += 1
        if (Bounds.compare(dt, k, sorted(i)._2) <= 0) out += sorted(i)._3
        i -= 1
        continue = i >= 0
      }
    }
    lastProbes = probes
    out.toSeq
  }
}
