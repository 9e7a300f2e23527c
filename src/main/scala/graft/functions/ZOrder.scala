package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/**
 * 64-bit Z-order (Morton) interleave over k long dimensions — the clustering
 * key the new engine sorts by, replacing the reference's implicit reliance on
 * HBase rowkey order (`job/JobUtil.java:597-598`) with a multi-dimensional
 * sort key over (lang, url-host, warc_ts).
 *
 * Pure static function + a codegen'd Catalyst [[Expression]], so the key
 * computation stays inside whole-stage codegen in the rewrite hot path
 * (no UDF serialization, no boxing per row).
 */
object ZOrder {

  /** Interleave the low `bitsPerDim` bits of each dim, MSB-first round-robin.
    * Requires dims.length * bitsPerDim <= 63. Null-safe at the expression
    * layer (nulls → 0). */
  def interleave(dims: Array[Long], bitsPerDim: Int): Long = {
    var out = 0L
    var b = bitsPerDim - 1
    while (b >= 0) {
      var d = 0
      while (d < dims.length) {
        out = (out << 1) | ((dims(d) >>> b) & 1L)
        d += 1
      }
      b -= 1
    }
    out
  }

  /** Column API: z-order key from already-normalized long dims. */
  def zkey(bitsPerDim: Int, dims: Column*): Column = {
    require(dims.nonEmpty && dims.size * bitsPerDim <= 63,
      s"zkey: ${dims.size} dims * $bitsPerDim bits must be <= 63")
    Shims.column(ZOrderKey(dims.map(d => Shims.expression(d.cast(LongType))), bitsPerDim))
  }

  /** Hash a string column into an n-bit dimension (equality locality). */
  def hashDim(c: Column, bits: Int): Column =
    pmod(xxhash64(c), lit(1L << bits))

  /** Order-preserving scale of a numeric/timestamp column with known bounds
    * into an n-bit dimension (range locality). Overflow-safe for the FULL
    * Long domain (ANSI mode errors on overflow, it doesn't wrap): the naive
    * `(c-min)*buckets/span` overflows once span·buckets exceeds 2^63 — e.g.
    * sortable-bits double embeddings span ~2^62 — so scale by a quotient
    * instead: `c/q - min/q` with q ≈ ceil(span/buckets). Truncating division
    * is monotonic non-decreasing, both sides use the same q, and the result
    * is within ±1 of the exact scale — absorbed by the clamp. */
  def rangeDim(c: Column, min: Long, max: Long, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    val span = BigInt(max) - BigInt(min) // Long subtraction itself can overflow
    if (span <= 0) return lit(0L)
    // wide span: divide down by q ≈ ceil(span/buckets); narrow span: the
    // quotient alone would leave the dim's TOP bits constant (and the dim
    // would never split files), so multiply the clamped base back up by
    // m = buckets/span — the product is ≤ buckets by construction, so the
    // scale-up cannot overflow either
    val q = ((span + buckets - 1) / buckets).max(1).toLong
    val m = if (span < buckets) buckets / span.toLong else 1L
    // MUST be integer division: Column./ is Spark's Divide, which casts
    // both longs to DOUBLE — encoded values above 2^53 (sortable-bits
    // doubles sit near 2^62) would quantize to 512-1024-wide steps and
    // collapse narrow spans to ~2 distinct dim values. IntegralDivide
    // (SQL `div`) truncates toward zero exactly like the driver-side
    // Scala `/` computing the min/q offset.
    val divided = Shims.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Shims.expression(c.cast(LongType)), Shims.expression(lit(q))))
    val base = least(lit((span min BigInt(buckets)).toLong), greatest(lit(0L),
      divided - lit(min / q)))
    if (m == 1L) base else base * lit(m)
  }

  /** Dictionary dim: position in a small known domain. The dictionary is
    * sorted first — stats pruning compares file min/max in STRING order, so
    * the dim encoding must be order-preserving w.r.t. the column's natural
    * order or per-file bounds stay wide. Unknown values hash. */
  def dictDim(c: Column, dict: Seq[String], bits: Int): Column = {
    val sorted = dict.sorted
    val scale = ((1L << bits) - 1) / math.max(1, sorted.size - 1)
    val m = typedLit(sorted.zipWithIndex.map { case (s, i) => s -> i * scale }.toMap)
    coalesce(element_at(m, c).cast(LongType), pmod(xxhash64(c), lit(1L << bits)))
  }

  /** Driver-side mirror of [[packedPrefix]] — MUST stay bit-identical to
    * the column expression (used to derive host bounds from file metadata
    * without scanning data). */
  def packPrefixScala(s: String, chars: Int = 8): Long = {
    val padded = (if (s == null) "" else s).padTo(chars, ' ')
    var out = 0L
    var i = 0
    while (i < chars) {
      out = (out << 7) | math.min(padded.charAt(i).toLong, 127L)
      i += 1
    }
    out
  }

  /** Order-preserving string dim, unscaled (top `bits` of the packed
    * prefix). Only discriminates when the domain has no long shared
    * prefix; prefer `rangeDim(packedPrefix(c), observedMin, observedMax,
    * bits)` with bounds measured from the data. */
  def prefixDim(c: Column, bits: Int, chars: Int = 4): Column = {
    require(chars * 7 >= bits, s"need ceil($bits/7) chars for $bits bits")
    (packedPrefix(c, chars) / lit(1L << (7 * chars - bits))).cast(LongType)
  }

  /** Raw order-preserving packing of the first `chars` ASCII characters
    * into a long (7 bits each, MSB-first). Shared-prefix domains (every
    * host "host-*", every url "https://...") pack into a narrow band, so
    * for interleaving this MUST be range-scaled to the observed data
    * min/max ([[rangeDim]]) -- otherwise the dim's top bits are constant
    * and it never splits files. */
  def packedPrefix(c: Column, chars: Int = 8): Column = {
    require(chars * 7 <= 62, s"at most 8 chars fit in a long ($chars given)")
    val padded = rpad(coalesce(c, lit("")), chars, " ")
    (0 until chars).map { i =>
      (least(ascii(substring(padded, i + 1, 1)), lit(127)).cast(LongType)) *
        lit(1L << (7 * (chars - 1 - i)))
    }.reduce(_ + _)
  }
}

/** `ZOrderKey(d1..dk, bits)` → LongType. Children must be LongType (the
  * [[ZOrder.zkey]] builder inserts casts). Null dims contribute 0. */
case class ZOrderKey(children: Seq[Expression], bitsPerDim: Int) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_key"

  override def eval(input: InternalRow): Any = {
    val dims = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      dims(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    ZOrder.interleave(dims, bitsPerDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zdims")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        long[] $arr = new long[${children.size}];
        $assigns
        final long ${ev.value} = graft.functions.ZOrder.interleave($arr, $bitsPerDim);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
