package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/**
 * Order-preserving Long embeddings, one per supported column type: a
 * row-side `Column` producing a Long, paired with a driver-side decoder
 * from the column's canonical bound string ([[graft.table.Bounds]]) into
 * the SAME Long space.
 *
 * The pair is the contract every range-layout pass in the engine depends
 * on: MERGE output steering derives equi-depth boundaries from file
 * metadata and assigns rows with the column expression
 * ([[graft.ops.Merge]]), and generic Z-order clustering range-scales each
 * dimension to metadata bounds ([[graft.ops.Cluster]]). If row side and
 * metadata side disagreed, post-rewrite files would lose the tight
 * per-file bounds all downstream pruning stabs into.
 *
 * Embeddings by type:
 *  - strings → 8-char 7-bit packed prefix ([[ZOrder.packedPrefix]]), after
 *    dropping `stripPrefix` leading chars on BOTH sides (web corpora share
 *    "https://…"-style prefixes that would otherwise pin every packed
 *    value to one point — found by the 10 GB merge soak);
 *  - integrals verbatim; timestamps → epoch micros (NTZ reads wall time —
 *    matching the canonical bound encoding); dates → epoch days;
 *  - double/float → IEEE-754 sortable bits ([[SortableBits]]);
 *  - decimal (p ≤ 18) → unscaled long (fixed scale keeps order);
 *  - decimal (18 < p ≤ 38) → nearest-double sortable bits (monotone, not
 *    injective — exactly what range layouts need; near-ties collapse into
 *    one partition, never invert);
 *  - boolean → 0/1.
 * Binary and nested types have no Long-sized order embedding → None
 * (callers fall back: hash scatter for merges, a loud error for
 * user-requested clustering columns).
 */
object OrderedEncoding {

  def forType(dt: DataType, c: Column, stripPrefix: Int = 0): Option[(Column, String => Long)] =
    dt match {
      case StringType =>
        Some((ZOrder.packedPrefix(substring(c, stripPrefix + 1, 8), 8),
          (s: String) => ZOrder.packPrefixScala(s.drop(stripPrefix))))
      case ByteType | ShortType | IntegerType | LongType =>
        Some((c.cast("long"), (s: String) => s.toLong))
      case TimestampType =>
        Some((unix_micros(c), (s: String) => s.toLong))
      case TimestampNTZType =>
        // canonicalKey parity (ops/Merge): NTZ wall time via a session-local
        // cast; bound strings already store micros
        Some((unix_micros(c.cast("timestamp")), (s: String) => s.toLong))
      case DateType =>
        Some((unix_date(c).cast("long"), (s: String) => s.toLong))
      case DoubleType =>
        Some((SortableBits(c), (s: String) => SortableBits.encode(s.toDouble)))
      case FloatType =>
        // bound strings are float decimal strings; re-parse as FLOAT then
        // widen so both sides see the same double ((1.1f).toDouble differs
        // from "1.1".toDouble)
        Some((SortableBits(c.cast("double")),
          (s: String) => SortableBits.encode(s.toFloat.toDouble)))
      case d: DecimalType if d.precision <= 18 =>
        // UnscaledValue is the (public-API-reachable) codegen'd kernel Spark
        // itself aggregates small decimals with
        Some((Shims.column(
            org.apache.spark.sql.catalyst.expressions.UnscaledValue(Shims.expression(c))),
          (s: String) => new java.math.BigDecimal(s)
            .setScale(d.scale, java.math.RoundingMode.FLOOR).unscaledValue().longValue()))
      case _: DecimalType => // wide decimals (18 < p <= 38) — r5 advice
        // no 64-bit unscaled embedding exists past p=18, but decimal →
        // double is MONOTONE (round-to-nearest never inverts order; near
        // ties only collapse), and a range layout needs monotonicity, not
        // injectivity: rows with equal encodings ride the same partition
        // and per-file bounds stay tight (parquet stats use the true
        // decimal values). Collapsed spans degrade gracefully to the
        // scatter fallback via the boundary-count guard in Merge. Row side
        // and bound-string decode go through the same nearest-double
        // (Spark's Cast(decimal→double) == BigDecimal.doubleValue).
        Some((SortableBits(c.cast("double")),
          (s: String) => SortableBits.encode(new java.math.BigDecimal(s).doubleValue())))
      case BooleanType =>
        Some((c.cast("long"), (s: String) => if (s.toBoolean) 1L else 0L))
      case _ => None
    }

  /** Longest common prefix of two strings. */
  def lcp(a: String, b: String): String = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    a.substring(0, i)
  }
}
