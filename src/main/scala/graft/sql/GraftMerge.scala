package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.LongType

import graft.ops.Merge
import graft.table.GraftTable

/**
 * SQL `MERGE INTO` surface for graft tables — the reference's merge is
 * user-facing SQL (it GENERATES executable HiveQL merge scripts,
 * `hive/HiveTableIR.java:234-302`); this gives the engine the same front
 * door through Spark's own parser:
 *
 * {{{
 *   MERGE INTO graft.`/path/to/table` t
 *   USING changes s
 *   ON t.url = s.url
 *   WHEN MATCHED AND s.op = 'D' THEN DELETE
 *   WHEN MATCHED THEN UPDATE SET *
 *   WHEN NOT MATCHED THEN INSERT *
 * }}}
 *
 * The rule runs in the analyzer's EARLY (hint-resolution) batch: it must
 * intercept Catalyst's `MergeIntoTable` before the main resolution batch,
 * whose ResolveSQLOnFile rule would otherwise reject `graft.`-qualified
 * identifiers (the engine registers DataSource short name "graft", which
 * that rule treats as an unsupported direct file query). The source
 * subtree is carried UNRESOLVED and analyzed when the command runs. The
 * conversion rewrites the statement into a runnable command planning through
 * [[graft.ops.Merge.into]] — same touched-file pruning, same sort-merge
 * join, same copy-on-write commit as the programmatic API, with ANSI
 * matched-rows-always-apply semantics (`latestWins = false`).
 *
 * Supported shapes (anything else fails analysis with a clear error):
 *   - `WHEN MATCHED THEN UPDATE SET *` [+ `WHEN NOT MATCHED THEN INSERT *`]
 *   - `WHEN MATCHED AND <source predicate> THEN DELETE` combined with the above
 *   - `WHEN MATCHED THEN DELETE` alone (delete every matched key)
 */
case class GraftMergeRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case m: MergeIntoTable if graftPath(m.targetTable).isDefined =>
      convert(m, graftPath(m.targetTable).get)
  }

  private def graftPath(target: LogicalPlan): Option[String] = target match {
    case SubqueryAlias(_, child) => graftPath(child)
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
      Some(u.multipartIdentifier(1))
    case _ => None
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft MERGE INTO: $msg")

  private def convert(m: MergeIntoTable, path: String): LogicalPlan = {
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    val keyCol = m.mergeCondition match {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last == b.nameParts.last => a.nameParts.last
      case other =>
        fail(s"ON must be a single equi-condition t.<key> = s.<key>, got $other")
    }
    var deleteCond: Option[Expression] = None
    var sawUpdate = false
    // ANSI first-match-wins ordering: clauses after an unconditional one are
    // unreachable, and a clause before a prior conditional one is NOT
    // shadowed — supported shapes preserve exactly those semantics, anything
    // order-ambiguous fails instead of silently reordering
    m.matchedActions.foreach {
      case UpdateStarAction(None) =>
        sawUpdate = true
      case UpdateStarAction(Some(c)) =>
        fail(s"conditional UPDATE SET * is not supported (condition: $c)")
      case DeleteAction(c) =>
        if (sawUpdate) fail(
          "DELETE after an unconditional UPDATE SET * is unreachable (first matching clause wins)")
        if (deleteCond.nonEmpty) fail("at most one DELETE clause")
        deleteCond = Some(c.getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral))
      case other => fail(s"unsupported matched action $other (only UPDATE SET * / DELETE)")
    }
    if (deleteCond.exists(_ == org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral) && sawUpdate)
      fail("UPDATE SET * after an unconditional DELETE is unreachable (first matching clause wins)")
    val insert = m.notMatchedActions match {
      case Seq() => false
      case Seq(InsertStarAction(None)) => true
      case other => fail(s"only WHEN NOT MATCHED THEN INSERT * is supported, got $other")
    }
    if (!sawUpdate && deleteCond.isEmpty) fail("no supported matched action")
    if (!sawUpdate && deleteCond.exists(_ == org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral) && insert)
      fail("DELETE-all-matched combined with INSERT is ambiguous; add an UPDATE SET * clause")
    // the delete predicate applies to SOURCE columns only: a target-side
    // reference would silently rebind to the same-named SOURCE column after
    // qualifier stripping, deciding deletes on the wrong relation
    val targetAlias = m.targetTable match {
      case SubqueryAlias(ident, _) => Some(ident.name)
      case _ => None
    }
    for (c <- deleteCond; a <- c.collect { case a: UnresolvedAttribute => a })
      if (a.nameParts.length > 1 && targetAlias.contains(a.nameParts.head))
        fail(s"DELETE condition may reference SOURCE columns only, got target-side ${a.name} " +
          "(it is evaluated on the change rows before the merge join)")
    val stripped = deleteCond.map(_.transformUp {
      case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
    })
    GraftMergeCommand(path, m.sourceTable, keyCol,
      stripped.map(ExprHolder), insertUnmatched = insert, updateMatched = sawUpdate)
  }
}

/** Opaque wrapper keeping a deliberately-unresolved expression out of
  * `QueryPlan.expressions` — CheckAnalysis would otherwise reject the
  * command for carrying it (it resolves against the source at run time). */
case class ExprHolder(e: Expression)

/** Runs [[graft.ops.Merge.into]] for a SQL MERGE statement; returns the
  * committed snapshot id as the statement result. */
case class GraftMergeCommand(
    path: String,
    source: LogicalPlan,
    keyCol: String,
    deleteCond: Option[ExprHolder],
    insertUnmatched: Boolean,
    updateMatched: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] = Seq(source)
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())

  override def run(session: SparkSession): Seq[Row] = {
    val table = GraftTable.load(session, path)
    var src = Shims.dataFrame(session, source)
    for (c <- deleteCond)
      src = src.withColumn("_deleted", Shims.column(c.e).cast("boolean"))
    if (!updateMatched)
      // delete-only MERGE: matched rows NOT satisfying the delete condition
      // must stay untouched, so only the delete rows enter the merge at all
      // (Merge.into with latestWins=false would otherwise UPDATE them)
      src = src.filter(org.apache.spark.sql.functions.col("_deleted"))
    if (!insertUnmatched) {
      // no INSERT clause: unmatched source rows must be ignored — restrict
      // the source to keys present in the target's touched files
      val existing = table.read().select(keyCol)
      src = src.join(existing, Seq(keyCol), "left_semi")
    }
    val snap = Merge.into(table, src, keyCol, latestWins = false)
    Seq(Row(snap.id))
  }
}
