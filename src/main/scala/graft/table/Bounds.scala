package graft.table

import java.math.BigInteger

import org.apache.spark.sql.types._

/**
 * Canonical string encoding + ordered comparison for per-file column bounds.
 *
 * Files carry `minValues`/`maxValues` as strings (JSON-friendly); comparisons
 * parse them with the table schema. Timestamps are epoch micros, dates epoch
 * days, so lexicographic issues never arise — everything numeric is compared
 * numerically, strings by UTF-8 order (matching Parquet's unsigned binary
 * comparator for UTF-8 strings).
 */
object Bounds {

  /** Compare two canonical bound strings under the given Spark type.
    * Returns negative/zero/positive like compareTo. */
  def compare(dt: DataType, a: String, b: String): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
        TimestampNTZType | DateType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case FloatType | DoubleType =>
      java.lang.Double.compare(a.toDouble, b.toDouble)
    case _: DecimalType => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case BooleanType   => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case StringType    =>
      // unsigned byte-wise compare of UTF-8, = Parquet binary stats ordering
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(ab(i) & 0xff, bb(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(ab.length, bb.length)
    case _ => throw new IllegalArgumentException(s"no bound ordering for $dt")
  }

  /** Whether `dt` supports bounds at all (binary/nested columns do not). */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
        TimestampNTZType | DateType | FloatType | DoubleType | BooleanType |
        StringType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Canonical string for a literal value of Catalyst-internal representation
    * (what `Literal.value` holds): UTF8String, Long micros for timestamps,
    * Int days for dates, etc. */
  def fromCatalystLiteral(dt: DataType, v: Any): Option[String] =
    if (v == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | LongType | TimestampType |
          TimestampNTZType | DateType | FloatType | DoubleType | BooleanType =>
        Some(v.toString)
      case _: DecimalType => Some(v.toString)
      case StringType     => Some(v.toString) // UTF8String.toString
      case _              => None
    }

  /** Inverse of [[fromCatalystLiteral]]: canonical bound string → the
    * Catalyst-internal value of type `dt` (micros Long for timestamps, days
    * Int for dates, UTF8String for strings). */
  def toCatalystValue(dt: DataType, s: String): Option[Any] = dt match {
    case ByteType            => s.toByteOption
    case ShortType           => s.toShortOption
    case IntegerType         => s.toIntOption
    case LongType            => s.toLongOption
    case TimestampType | TimestampNTZType => s.toLongOption
    case DateType            => s.toIntOption
    case FloatType           => s.toFloatOption
    case DoubleType          => s.toDoubleOption
    case BooleanType         => s.toBooleanOption
    case StringType          => Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    case _: DecimalType      =>
      scala.util.Try(org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(s))).toOption
    case _                   => None
  }

  /** min of two canonical strings */
  def min(dt: DataType, a: String, b: String): String = if (compare(dt, a, b) <= 0) a else b
  def max(dt: DataType, a: String, b: String): String = if (compare(dt, a, b) >= 0) a else b

  /** Stats truncation length for string bounds (Iceberg truncates at 16; 32
    * keeps url prefixes discriminating). At 10^5 files, storing full `text`
    * values would put GBs of document bodies into manifests — bounds must be
    * O(bytes) per entry, and WIDER bounds are always sound for pruning. */
  val StatsTruncateLen = 32

  /** Lower bound truncation: a prefix is ≤ every string extending it.
    * Backs off one char when the cut would split a UTF-16 surrogate pair —
    * a lone trailing high surrogate only round-trips by encoder accident
    * (String.getBytes(UTF-8) and JSON writers replace it with U+FFFD/'?'),
    * so the stored bound must stay well-formed. */
  def truncatedMin(dt: DataType, v: String, len: Int = StatsTruncateLen): String = dt match {
    case StringType if v.length > len =>
      val cut = if (Character.isHighSurrogate(v.charAt(len - 1))) len - 1 else len
      v.substring(0, cut)
    case _ => v
  }

  /** Upper bound truncation: prefix with its last ASCII char incremented is
    * > every string sharing the untouched prefix (UTF-8 byte order; the
    * increment stays single-byte). Falls back to the full value when no
    * char < 0x7F exists to increment — sound either way. The increment
    * position is always ASCII (< 0x7F), never a surrogate, and everything
    * after it is dropped, so the result is always well-formed UTF-16. */
  def truncatedMax(dt: DataType, v: String, len: Int = StatsTruncateLen): String = dt match {
    case StringType if v.length > len =>
      val p = v.substring(0, len).toCharArray
      var i = p.length - 1
      while (i >= 0) {
        if (p(i) < 0x7f) {
          p(i) = (p(i) + 1).toChar
          return new String(p, 0, i + 1)
        }
        i -= 1
      }
      v
    case _ => v
  }

  /** Decode a Parquet statistics generic value (as produced by
    * parquet-mr `Statistics.genericGetMin/Max`) to canonical string. */
  def fromParquetStat(dt: DataType, v: Any): Option[String] = (dt, v) match {
    case (_, null) => None
    case (StringType, b: org.apache.parquet.io.api.Binary) => Some(b.toStringUsingUTF8)
    // parquet stores decimals as UNSCALED values (int32/int64/binary by
    // precision); the canonical bound string is the SCALED decimal — the
    // same space fromCatalystLiteral/toCatalystValue and MERGE key
    // canonicalization use, or pruning comparisons are off by 10^scale
    case (d: DecimalType, b: org.apache.parquet.io.api.Binary) =>
      Some(new java.math.BigDecimal(new BigInteger(b.getBytes), d.scale).toString)
    case (d: DecimalType, n: java.lang.Number) =>
      Some(java.math.BigDecimal.valueOf(n.longValue, d.scale).toString)
    case (BooleanType, b: java.lang.Boolean) => Some(b.toString)
    case (DateType, i: java.lang.Integer) => Some(i.toString)
    case (TimestampType | TimestampNTZType, l: java.lang.Long) => Some(l.toString)
    case (ByteType | ShortType | IntegerType | LongType, n: java.lang.Number) =>
      Some(n.longValue.toString)
    case (FloatType | DoubleType, n: java.lang.Number) => Some(n.doubleValue.toString)
    case _ => None
  }
}
