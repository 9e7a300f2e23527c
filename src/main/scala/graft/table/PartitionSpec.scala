package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Hidden partitioning (Iceberg-style partition transforms): the table
 * declares TRANSFORMS of data columns (property `partition-spec`, e.g.
 * `bucket(16, host), days(warc_ts)`), writers group rows by the transform
 * values so every data file covers exactly one partition tuple, and scan
 * planning prunes transform predicates — the user never sees or maintains a
 * partition column. This is the structured analog of the reference's
 * rowkey-literal fields (`hbase/Rowkey.java:36-38`), which bake
 * scan-partitioning values into the key, and `bucket(n, col)` is its murmur
 * salt prefix (`hbase/RowkeyField.java:139-154`) made declarative.
 *
 * Transforms: `identity(col)`, `days(col)`, `hours(col)`, `months(col)`,
 * `years(col)` (time hierarchies), `truncate(w, col)` (string prefix /
 * integral floor-to-multiple), `bucket(n, col)` (murmur3 hash mod n).
 *
 * The partition columns materialize only in directory names
 * (`gp_days_warc_ts=2025-01-03/gp_bucket_16_host=7/part-*.parquet`) — data
 * files carry schema columns only, so files written BEFORE a spec was set
 * and files written under it read identically. The dir prefix deliberately
 * avoids `_`/`.` (Spark's file listers treat those as hidden).
 *
 * Pruning needs no partition metadata at all:
 *  - the time/truncate transforms are monotonic, so [[PredicatePrune]] maps
 *    per-file min/max bounds through the transform — and partition-grouped
 *    files make those transformed bounds EXACT (one value per file), which
 *    is what turns `to_date(warc_ts) = D` into constant-fraction file
 *    skipping; range predicates on the raw column prune off the raw bounds
 *    directly (grouping makes them tight too);
 *  - `bucket` is NOT monotonic, so equality predicates on its source column
 *    prune by the partition VALUE parsed back from the file's directory
 *    name ([[dirValue]]): `host = h` keeps only files of bucket(h). Range
 *    predicates on a bucketed column never prune by design.
 */
final case class PartitionSpec(transform: String, sourceColumn: String, param: Option[Int] = None) {

  /** physical (directory-only) column name */
  val name: String = param match {
    case Some(p) => s"gp_${transform}_${p}_$sourceColumn"
    case None    => s"gp_${transform}_$sourceColumn"
  }

  /** the transform as a Catalyst column over the data columns; time
    * hierarchies lower onto expressions [[PredicatePrune]] already knows
    * are monotonic (to_date / trunc), so bounds map through them */
  def column(schema: StructType): Column = {
    val c = col(sourceColumn)
    transform match {
      case "identity" => c
      case "days"     => to_date(c)
      case "hours"    => date_trunc("hour", c)
      case "months"   => trunc(to_date(c), "month")
      case "years"    => trunc(to_date(c), "year")
      case "bucket"   => pmod(hash(c), lit(param.get))
      case "truncate" => schema.fields.find(_.name == sourceColumn).map(_.dataType) match {
        case Some(StringType) => substring(c, 1, param.get)
        case _                => c - pmod(c, lit(param.get.toLong)) // floor to multiple (pmod ≥ 0)
      }
    }
  }

  /** Validate against the table schema (column exists, type fits). */
  def validate(schema: StructType): Unit = {
    val f = schema.fields.find(_.name == sourceColumn).getOrElse(
      throw new IllegalArgumentException(s"partition spec $this references unknown column $sourceColumn"))
    def req(ok: Boolean, what: String): Unit =
      require(ok, s"partition spec $this: $what (column is ${f.dataType.simpleString})")
    transform match {
      case "days" | "hours" | "months" | "years" =>
        req(f.dataType == TimestampType || f.dataType == TimestampNTZType || f.dataType == DateType,
          "needs a timestamp/date column")
      case "truncate" =>
        req(Set[DataType](StringType, ByteType, ShortType, IntegerType, LongType)(f.dataType),
          "needs a string or integral column")
        require(param.exists(_ >= 1), s"partition spec $this: width must be >= 1")
      case "bucket" =>
        req(Bounds.supported(f.dataType), "needs an atomic-typed column")
        require(param.exists(_ >= 1), s"partition spec $this: bucket count must be >= 1")
      case _ => ()
    }
  }

  /** bucket id of a Catalyst-internal value (murmur3 mod n — evaluated
    * through Spark's own hash expression, so it matches [[column]] exactly
    * whatever the engine version does internally). None if the value cannot
    * be cast to the column's type. */
  def bucketOf(value: Any, valueType: DataType, columnType: DataType): Option[Int] = {
    if (transform != "bucket") return None
    scala.util.Try {
      val cast =
        if (valueType == columnType) value
        else Cast(Literal.create(value, valueType), columnType, Some("UTC")).eval(null)
      if (cast == null) null
      else Pmod(new Murmur3Hash(Seq(Literal.create(cast, columnType))), Literal(param.get)).eval(null)
    }.toOption.flatMap(Option(_)).map(_.asInstanceOf[Int])
  }

  /** This spec's partition value recorded in a data-file path, if any
    * (files written before the spec was set have none — never pruned). */
  def dirValue(path: String): Option[String] = {
    val needle = s"$name="
    val i = path.indexOf(needle)
    if (i < 0 || (i > 0 && path.charAt(i - 1) != '/')) None
    else {
      val start = i + needle.length
      val end = path.indexOf('/', start)
      Some(if (end < 0) path.substring(start) else path.substring(start, end))
    }
  }

  override def toString: String = param match {
    case Some(p) => s"$transform($p, $sourceColumn)"
    case None    => s"$transform($sourceColumn)"
  }
}

object PartitionSpec {

  /** table property key (the ACTIVE spec — what new writes lay out by) */
  val Property = "partition-spec"

  /** table property key holding OUTGOING spec generations (";"-joined spec
    * strings — each generation itself is a comma-joined multi-spec), kept
    * so files written under them keep partition-pruning and maintenance
    * grouping after a [[graft.table.GraftTable.setPartitionSpec]] change */
  val HistoryProperty = "partition-spec-history"

  /** The history property's wire format lives HERE only (writer below,
    * both readers in GraftTable go through this). */
  def parseHistory(prop: Option[String]): Seq[String] =
    prop.toSeq.flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)

  def serializeHistory(generations: Seq[String]): String =
    generations.mkString(";")

  private val NoArg = """^(days|hours|months|years|identity)\(\s*([A-Za-z0-9_]+)\s*\)$""".r
  private val IntArg = """^(bucket|truncate)\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)$""".r

  def parse(s: String): PartitionSpec = s.trim match {
    case NoArg(t, c)     => PartitionSpec(t, c)
    case IntArg(t, n, c) => PartitionSpec(t, c, Some(n.toInt))
    case other => throw new IllegalArgumentException(
      s"unsupported partition spec '$other' — supported: identity(col), days(col), " +
        "hours(col), months(col), years(col), bucket(n, col), truncate(w, col)")
  }

  /** Partition-tuple key of a data file under `specs` (dir values joined;
    * empty string for pre-spec files) — THE grouping rule partition-aware
    * maintenance shares (Compact bin-packing, Cluster rewrite groups). */
  def fileKey(specs: Seq[PartitionSpec], f: graft.table.DataFileMeta): String =
    specs.flatMap(sp => sp.dirValue(f.path).map(v => s"${sp.name}=$v")).mkString("/")

  /** Parse a comma-separated multi-transform spec, e.g.
    * `bucket(16, host), days(warc_ts)`. */
  def parseMulti(s: String): Seq[PartitionSpec] = {
    // split on commas OUTSIDE parentheses (transform args contain commas)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => parts += s.substring(start, i); start = i + 1
      case _ => ()
    }
    parts += s.substring(start)
    val specs = parts.map(_.trim).filter(_.nonEmpty).map(parse).toSeq
    require(specs.nonEmpty, s"empty partition spec '$s'")
    require(specs.map(_.name).distinct.size == specs.size, s"duplicate transform in '$s'")
    specs
  }
}
