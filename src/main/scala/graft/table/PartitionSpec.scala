package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Hidden partitioning (Iceberg-style partition transforms): the table
 * declares a TRANSFORM of a data column (property `partition-spec`, e.g.
 * `days(warc_ts)`), writers group rows by the transform value so every data
 * file covers exactly one partition value, and scan planning prunes
 * transform predicates — the user never sees or maintains a partition
 * column. This is the structured analog of the reference's rowkey-literal
 * fields (`hbase/Rowkey.java:36-38`), which bake scan-partitioning values
 * into the key.
 *
 * The partition column materializes only in directory names
 * (`gp_days_warc_ts=2025-01-03/part-*.parquet`) — data files carry schema
 * columns only, so files written BEFORE a spec was set and files written
 * under it read identically. The dir prefix deliberately avoids `_`/`.`
 * (Spark's file listers treat those as hidden).
 *
 * Pruning needs no partition metadata at all: the transforms are monotonic,
 * so [[PredicatePrune]] maps per-file min/max bounds through the transform
 * — and partition-grouped files make those transformed bounds EXACT (one
 * value per file), which is what turns `to_date(warc_ts) = D` into
 * constant-fraction file skipping.
 */
final case class PartitionSpec(transform: String, sourceColumn: String) {

  /** physical (directory-only) column name */
  val name: String = s"gp_${transform}_$sourceColumn"

  /** the transform as a Catalyst column over the data columns */
  def column: Column = transform match {
    case "days"     => to_date(col(sourceColumn))
    case "identity" => col(sourceColumn)
  }

  override def toString: String = s"$transform($sourceColumn)"
}

object PartitionSpec {

  /** table property key */
  val Property = "partition-spec"

  private val Re = """^(days|identity)\(\s*([A-Za-z0-9_]+)\s*\)$""".r

  def parse(s: String): PartitionSpec = s.trim match {
    case Re(t, c) => PartitionSpec(t, c)
    case other => throw new IllegalArgumentException(
      s"unsupported partition spec '$other' — supported: days(col), identity(col)")
  }
}
