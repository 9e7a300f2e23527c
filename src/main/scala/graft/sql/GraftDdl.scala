package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateTable, CreateTableAsSelect, DropTable, LogicalPlan, UnresolvedTableSpec}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{StructField, StructType}

import graft.table.{FileIO, GraftTable, PartitionSpec}

/**
 * SQL DDL for graft tables, completing the statement lifecycle
 * (CREATE → INSERT → SELECT → MERGE/UPDATE/DELETE → ALTER → DROP):
 *
 * {{{
 *   CREATE TABLE graft.`/path` (url STRING, warc_ts TIMESTAMP, html BINARY,
 *                               text STRING, lang STRING)
 *   PARTITIONED BY (days(warc_ts))                -- hidden partitioning
 *   CREATE TABLE graft.`/path2` AS SELECT ...     -- CTAS (create + append)
 *   DROP TABLE [IF EXISTS] graft.`/path`
 * }}}
 *
 * `PARTITIONED BY (days(col))` / `(col)` map to the engine's
 * [[PartitionSpec]] table property — the Iceberg-style transform DDL a
 * user would expect. Same early-batch interception as the other
 * statements (see [[GraftMergeRule]]).
 */
case class GraftDdlRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case c: CreateTable if identPath(c.name).isDefined =>
      GraftCreateTableCommand(identPath(c.name).get, columnsToSchema(c.columns),
        props(c.partitioning, c.tableSpec), c.ignoreIfExists, None)
    case c: CreateTableAsSelect if identPath(c.name).isDefined =>
      GraftCreateTableCommand(identPath(c.name).get, new StructType(),
        props(c.partitioning, c.tableSpec), c.ignoreIfExists, Some(c.query))
    case d: DropTable if identPath(d.child).isDefined =>
      GraftDropTableCommand(identPath(d.child).get, d.ifExists)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft DDL: $msg")

  private def identPath(p: LogicalPlan): Option[String] = p match {
    case u: UnresolvedIdentifier
        if u.nameParts.length == 2 && u.nameParts.head.equalsIgnoreCase("graft") =>
      Some(u.nameParts(1))
    case v: UnresolvedTableOrView
        if v.multipartIdentifier.length == 2 &&
          v.multipartIdentifier.head.equalsIgnoreCase("graft") =>
      Some(v.multipartIdentifier(1))
    case _ => None
  }

  private def columnsToSchema(
      cols: Seq[org.apache.spark.sql.catalyst.plans.logical.ColumnDefinition]): StructType =
    StructType(cols.map { c =>
      if (c.defaultValue.nonEmpty) fail(s"column ${c.name}: DEFAULT values are not supported")
      if (c.generationExpression.nonEmpty)
        fail(s"column ${c.name}: generated columns are not supported")
      StructField(c.name, c.dataType, c.nullable, c.metadata)
    })

  private def props(
      partitioning: Seq[Transform],
      spec: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase): Map[String, String] = {
    val base = spec match {
      case u: UnresolvedTableSpec =>
        for (p <- u.provider if !p.equalsIgnoreCase("graft"))
          fail(s"USING $p — graft.`path` tables are always the graft format")
        for (l <- u.location)
          fail(s"LOCATION '$l' — the table path IS the identifier")
        u.properties
      case _ => Map.empty[String, String]
    }
    val part =
      if (partitioning.isEmpty) Map.empty[String, String]
      else Map(PartitionSpec.Property -> partitioning.map(transformSpec).mkString(", "))
    base ++ part
  }

  /** One `PARTITIONED BY` transform → its [[PartitionSpec]] string. */
  private def transformSpec(t: Transform): String = {
    val col = t.references.headOption
      .map(_.fieldNames.mkString("."))
      .getOrElse(fail(s"cannot read partition column from $t"))
    def intArg: Int = t.arguments.collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] => l.value match {
        case i: Integer => i.intValue
        case i: java.lang.Long => i.intValue
        case other => fail(s"partition transform ${t.name}: non-integer argument $other")
      }
    }.getOrElse(fail(s"partition transform ${t.name} needs an integer argument"))
    t.name match {
      case n @ ("days" | "hours" | "months" | "years" | "identity") => s"$n($col)"
      case n @ ("bucket" | "truncate") => s"$n($intArg, $col)"
      case other => fail(s"unsupported partition transform $other(...) (supported: " +
        "identity, days, hours, months, years, bucket(n, col), truncate(w, col))")
    }
  }
}

/** CREATE TABLE (optionally AS SELECT): creates the metadata tree; CTAS
  * then appends the query result as the first snapshot. */
case class GraftCreateTableCommand(
    path: String,
    tableSchema: StructType,
    properties: Map[String, String],
    ignoreIfExists: Boolean,
    ctasQuery: Option[LogicalPlan]) extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    ctasQuery.toSeq
  override val output: Seq[Attribute] = Seq.empty

  override def run(session: SparkSession): Seq[Row] = {
    if (FileIO.exists(s"$path/metadata/v1.json")) {
      if (ignoreIfExists) return Seq.empty
      throw new IllegalArgumentException(s"graft table already exists at $path")
    }
    ctasQuery match {
      case None =>
        GraftTable.create(session, path, tableSchema, properties)
      case Some(q) =>
        val df = Shims.dataFrame(session, q)
        val t = GraftTable.create(session, path, df.schema, properties)
        t.append(df, Map("via" -> "sql-ctas"))
    }
    Seq.empty
  }
}

/** DROP TABLE: removes the table tree (metadata AND data — graft tables
  * own their path, so DROP is always a purge). */
case class GraftDropTableCommand(path: String, ifExists: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(session: SparkSession): Seq[Row] = {
    if (!FileIO.exists(s"$path/metadata/v1.json")) {
      if (ifExists) return Seq.empty
      throw new IllegalArgumentException(s"no graft table at $path")
    }
    FileIO.deleteRecursively(path)
    Seq.empty
  }
}
