package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
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
 *   ON t.host = s.host AND t.url = s.url          -- composite keys supported
 *   WHEN MATCHED AND s.op = 'D' THEN DELETE
 *   WHEN MATCHED THEN UPDATE SET text = s.text    -- or UPDATE SET *
 *   WHEN NOT MATCHED THEN INSERT (url, host, text) VALUES (s.url, s.host, s.text)
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
 *   - ON: a conjunction of equi-conditions `t.k1 = s.k1 AND … AND t.kn = s.kn`
 *     (the reference's all-rowkey-component join, `hive/HiveTableIR.java:311-315`)
 *   - at most ONE update clause: `UPDATE SET *` or `UPDATE SET c = expr, …`,
 *     optionally conditional
 *   - at most ONE delete clause, optionally conditional, before or after the
 *     update clause (ANSI first-match-wins ordering is honored)
 *   - at most ONE insert clause: `INSERT *` or `INSERT (cols) VALUES (…)`,
 *     optionally conditional — applied to EVERY unmatched source row
 *     regardless of matched-clause conditions (ANSI), which is why the
 *     command computes an explicit per-row matched flag below
 *   - at most ONE `WHEN NOT MATCHED BY SOURCE THEN DELETE | UPDATE SET c =
 *     expr` clause, optionally conditional; condition and values reference
 *     TARGET columns only (they evaluate on target rows with no source
 *     match). Unconditional forms rewrite the whole table — inherent to
 *     the semantics; conditional forms prune files by the condition.
 *   - all clause conditions and assignment values may reference SOURCE
 *     columns only (they are evaluated on the change rows; a target-side
 *     reference would silently rebind to the same-named source column)
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

  /** ON clause → ordered key column names (conjunction of equi-conditions). */
  private def keyColsOf(cond: Expression): Seq[String] = cond match {
    case And(l, r) => keyColsOf(l) ++ keyColsOf(r)
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last == b.nameParts.last => Seq(a.nameParts.last)
    case other =>
      fail(s"ON must be a conjunction of equi-conditions t.<k> = s.<k>, got $other")
  }

  private def convert(m: MergeIntoTable, path: String): LogicalPlan = {
    val keyCols = keyColsOf(m.mergeCondition)
    if (keyCols.distinct.size != keyCols.size)
      fail(s"duplicate key column in ON clause: ${keyCols.mkString(", ")}")

    val targetAlias = m.targetTable match {
      case SubqueryAlias(ident, _) => Some(ident.name)
      case _ => None
    }
    // every carried expression evaluates on the SOURCE rows before the merge
    // join — a target-side reference would silently rebind to the same-named
    // SOURCE column after qualifier stripping, deciding on the wrong relation
    def sourceOnly(e: Expression, what: String): ExprHolder = {
      for (a <- e.collect { case a: UnresolvedAttribute => a })
        if (a.nameParts.length > 1 && targetAlias.contains(a.nameParts.head))
          fail(s"$what may reference SOURCE columns only, got target-side ${a.name} " +
            "(it is evaluated on the change rows before the merge join)")
      ExprHolder(e.transformUp {
        case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
      })
    }
    def assignments(asg: Seq[Assignment], what: String): Seq[(String, ExprHolder)] =
      asg.map { a =>
        val name = a.key match {
          case u: UnresolvedAttribute =>
            if (u.nameParts.length > 1 && !targetAlias.forall(_ == u.nameParts.head))
              fail(s"$what assigns non-target column ${u.name}")
            u.nameParts.last
          case other => fail(s"$what must assign plain columns, got $other")
        }
        name -> sourceOnly(a.value, s"$what value for $name")
      }

    // matched clauses: at most one update-kind + one delete, order preserved
    // (ANSI first-match-wins: the flags are combined order-aware in run()).
    // Spark's parser already enforces that an unconditional clause is last.
    var update: Option[(Option[Expression], Seq[(String, ExprHolder)])] = None
    var delete: Option[Option[Expression]] = None
    var deleteFirst = false
    m.matchedActions.foreach {
      case UpdateStarAction(c) =>
        if (update.nonEmpty) fail("at most one UPDATE clause")
        update = Some((c, Seq.empty))
      case UpdateAction(c, asg, _) =>
        if (update.nonEmpty) fail("at most one UPDATE clause")
        val set = assignments(asg, "UPDATE SET")
        if (set.isEmpty) fail("UPDATE with no assignments")
        set.map(_._1).filter(keyCols.contains).foreach(k =>
          fail(s"UPDATE must not assign key column $k"))
        update = Some((c, set))
      case DeleteAction(c) =>
        if (delete.nonEmpty) fail("at most one DELETE clause")
        deleteFirst = update.isEmpty
        delete = Some(c)
      case other => fail(s"unsupported matched action $other")
    }
    // unreachable-clause guards behind the parser's unconditional-last rule
    if (update.nonEmpty && delete.nonEmpty) {
      if (deleteFirst && delete.get.isEmpty)
        fail("UPDATE after an unconditional DELETE is unreachable (first matching clause wins)")
      if (!deleteFirst && update.get._1.isEmpty)
        fail("DELETE after an unconditional UPDATE is unreachable (first matching clause wins)")
    }
    // NOT MATCHED BY SOURCE: acts on target rows absent from the source;
    // conditions/assignments evaluate on TARGET columns (before the join)
    val sourceAlias = m.sourceTable match {
      case SubqueryAlias(ident, _) => Some(ident.name)
      case _ => None
    }
    def targetOnly(e: Expression, what: String): ExprHolder = {
      for (a <- e.collect { case a: UnresolvedAttribute => a })
        if (a.nameParts.length > 1 && sourceAlias.contains(a.nameParts.head))
          fail(s"$what may reference TARGET columns only, got source-side ${a.name} " +
            "(it is evaluated on target rows that have NO source match)")
      ExprHolder(e.transformUp {
        case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
      })
    }
    var nmbsDelete = false
    var nmbsDeleteCond: Option[ExprHolder] = None
    var nmbsUpdate = Seq.empty[(String, ExprHolder)]
    var nmbsUpdateCond: Option[ExprHolder] = None
    var hasNmbsUpdate = false
    m.notMatchedBySourceActions.foreach { a =>
      if (nmbsDelete || hasNmbsUpdate) fail("at most one NOT MATCHED BY SOURCE action")
      a match {
        case DeleteAction(c) =>
          nmbsDelete = true
          nmbsDeleteCond = c.map(targetOnly(_, "NOT MATCHED BY SOURCE DELETE condition"))
        case UpdateAction(c, asg, _) =>
          hasNmbsUpdate = true
          nmbsUpdateCond = c.map(targetOnly(_, "NOT MATCHED BY SOURCE UPDATE condition"))
          nmbsUpdate = asg.map { x =>
            val name = x.key match {
              case u: UnresolvedAttribute => u.nameParts.last
              case other => fail(s"NOT MATCHED BY SOURCE UPDATE must assign plain columns, got $other")
            }
            if (keyCols.contains(name)) fail(s"UPDATE must not assign key column $name")
            name -> targetOnly(x.value, s"NOT MATCHED BY SOURCE UPDATE value for $name")
          }
          if (nmbsUpdate.isEmpty) fail("NOT MATCHED BY SOURCE UPDATE needs explicit assignments")
        case other => fail(s"unsupported NOT MATCHED BY SOURCE action $other")
      }
    }
    if (update.isEmpty && delete.isEmpty && m.notMatchedActions.isEmpty &&
        !nmbsDelete && !hasNmbsUpdate)
      fail("no supported action")

    val (insert, insertCond, insertValues) = m.notMatchedActions match {
      case Seq() => (false, None, Seq.empty[(String, ExprHolder)])
      case Seq(InsertStarAction(c)) => (true, c.map(sourceOnly(_, "INSERT condition")), Seq.empty)
      case Seq(InsertAction(c, asg)) =>
        val vals = assignments(asg, "INSERT")
        keyCols.filterNot(vals.map(_._1).contains).foreach(k =>
          fail(s"INSERT (cols) VALUES must assign key column $k"))
        (true, c.map(sourceOnly(_, "INSERT condition")), vals)
      case other => fail(s"at most one WHEN NOT MATCHED clause, got ${other.size}")
    }

    GraftMergeCommand(path, m.sourceTable, keyCols,
      hasUpdate = update.nonEmpty,
      updateCond = update.flatMap(_._1).map(sourceOnly(_, "UPDATE condition")),
      updateSet = update.map(_._2).getOrElse(Seq.empty),
      hasDelete = delete.nonEmpty,
      deleteCond = delete.flatten.map(sourceOnly(_, "DELETE condition")),
      deleteFirst = deleteFirst,
      insertUnmatched = insert,
      insertCond = insertCond,
      insertValues = insertValues,
      nmbsDelete = nmbsDelete,
      nmbsDeleteCond = nmbsDeleteCond,
      hasNmbsUpdate = hasNmbsUpdate,
      nmbsUpdateCond = nmbsUpdateCond,
      nmbsUpdate = nmbsUpdate)
  }
}

/** Opaque wrapper keeping a deliberately-unresolved expression out of
  * `QueryPlan.expressions` — CheckAnalysis would otherwise reject the
  * command for carrying it (it resolves against the source at run time). */
case class ExprHolder(e: Expression)

/** Runs [[graft.ops.Merge.into]] for a SQL MERGE statement; returns the
  * committed snapshot id as the statement result.
  *
  * Lowering: the source is augmented with a per-row `_matched` flag (a
  * left join against the DISTINCT key tuples read from the TOUCHED files
  * only — never a full-table scan), clause conditions become
  * first-match-wins boolean flags evaluated matched-side only (ANSI: a
  * NULL clause condition is false, and matched-clause conditions never
  * affect unmatched rows), rows no clause applies to are filtered out, and
  * column-level assignments become `_set_*`/`_ins_*` image columns for
  * [[graft.ops.Merge.into]]'s projection. */
case class GraftMergeCommand(
    path: String,
    source: LogicalPlan,
    keyCols: Seq[String],
    hasUpdate: Boolean,
    updateCond: Option[ExprHolder],
    updateSet: Seq[(String, ExprHolder)],
    hasDelete: Boolean,
    deleteCond: Option[ExprHolder],
    deleteFirst: Boolean,
    insertUnmatched: Boolean,
    insertCond: Option[ExprHolder],
    insertValues: Seq[(String, ExprHolder)],
    nmbsDelete: Boolean = false,
    nmbsDeleteCond: Option[ExprHolder] = None,
    hasNmbsUpdate: Boolean = false,
    nmbsUpdateCond: Option[ExprHolder] = None,
    nmbsUpdate: Seq[(String, ExprHolder)] = Seq.empty) extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] = Seq(source)
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())

  override def run(session: SparkSession): Seq[Row] = {
    val table = GraftTable.load(session, path)
    val schema = table.schema
    (updateSet ++ insertValues).map(_._1).filterNot(schema.fieldNames.contains).foreach(c =>
      throw new IllegalArgumentException(s"graft MERGE INTO: assignment to unknown column $c"))
    var src = Shims.dataFrame(session, source)
    // star actions take the WHOLE source row: a source missing schema
    // columns would silently write NULLs into them (Spark/Delta reject
    // this at analysis, and so do we)
    val starAction =
      (hasUpdate && updateSet.isEmpty, insertUnmatched && insertValues.isEmpty) match {
        case (true, _) => Some("UPDATE SET *")
        case (_, true) => Some("INSERT *")
        case _         => None
      }
    // column-name membership must follow the session resolver (Spark is
    // case-insensitive by default — an exact-match check would spuriously
    // reject SELECT 1 AS ID for target column id)
    val resolver = session.sessionState.analyzer.resolver
    for (star <- starAction; c <- schema.fieldNames if !src.columns.exists(resolver(_, c)))
      throw new IllegalArgumentException(
        s"graft MERGE INTO: $star requires the source to carry every table column; missing $c")
    // ANSI: a NULL clause condition behaves as FALSE
    def flag(h: Option[ExprHolder], default: Boolean): Column =
      h.map(x => coalesce(Shims.column(x.e).cast("boolean"), lit(false)))
        .getOrElse(lit(default))

    // per-row matched flag: key tuples are read from the files whose bounds
    // can contain a source key (touched files) — bounded by the change set,
    // not the table (a delete-only MERGE at 100 TB must not scan the corpus).
    // Merge.into re-plans touched files on the clause-FILTERED source below:
    // deliberate — the second pass is a key-only source scan, and planning
    // on the narrower set can exclude whole table files from the rewrite,
    // which dominates the repeated scan at scale.
    val touched = Merge.touchedFiles(table, src.select(keyCols.map(col): _*), keyCols)
    src =
      if (touched.isEmpty) src.withColumn("_matched", lit(false))
      else {
        val existing = session.read.schema(schema).parquet(touched.map(table.absPath): _*)
          .select(keyCols.map(col): _*).dropDuplicates(keyCols)
          .withColumn("_matched_t", lit(true))
        src.join(existing, keyCols, "left_outer")
          .withColumn("_matched", coalesce(col("_matched_t"), lit(false)))
          .drop("_matched_t")
      }

    // first-match-wins combination of the matched clauses
    val updC = flag(updateCond, hasUpdate)
    val delC = flag(deleteCond, hasDelete)
    val (updFlag, delFlag) =
      if (deleteFirst) (updC && !delC, delC) else (updC, delC && !updC)
    val insC = flag(insertCond, default = true)
    // assignment values evaluate ONLY on rows their clause fires for (the
    // If branches are lazy per row) — an ANSI-throwing expression like
    // CAST(s.x AS BIGINT) must not abort the merge when evaluated on a row
    // the clause never applies to (unfired matched rows, insert rows)
    for ((c, h) <- updateSet)
      src = src.withColumn(s"_set_$c", when(col("_matched") && updFlag, Shims.column(h.e)))
    for ((c, h) <- insertValues)
      src = src.withColumn(s"_ins_$c", when(!col("_matched") && insC, Shims.column(h.e)))
    // keep only rows some clause applies to: matched rows a matched clause
    // fires for, unmatched rows the insert clause admits — everything else
    // must leave its target row (or absence) untouched. With a NOT MATCHED
    // BY SOURCE clause, matched rows no clause fires for must STAY in the
    // source as presence-only `_noop` rows: dropping them would make their
    // target rows look unmatched-by-source and get wrongly deleted/updated.
    val nmbs = nmbsDelete || hasNmbsUpdate
    val firing = src
      .filter((col("_matched") && (updFlag || delFlag)) ||
        (!col("_matched") && lit(insertUnmatched) && insC))
      .withColumn("_deleted", col("_matched") && delFlag)
      .withColumn("_noop", lit(false))
    src =
      if (!nmbs) firing.drop("_matched")
      else {
        // presence-only rows: deduped per key and dropped when the key also
        // has a firing row — ANSI cardinality errors only when a target row
        // is actually MODIFIED by more than one source row, and the
        // uniqueness check downstream must see exactly that
        val noopRows = src.filter(col("_matched") && !updFlag && !delFlag)
          .dropDuplicates(keyCols)
          .join(firing.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
          .withColumn("_deleted", lit(false))
          .withColumn("_noop", lit(true))
        firing.unionByName(noopRows).drop("_matched")
      }

    val nmbsDel: Option[Column] =
      if (!nmbsDelete) None
      else Some(nmbsDeleteCond.map(h => Shims.column(h.e)).getOrElse(lit(true)))
    val nmbsSet: Option[(Column, Map[String, Column])] =
      if (!hasNmbsUpdate) None
      else Some((
        nmbsUpdateCond.map(h => Shims.column(h.e)).getOrElse(lit(true)),
        nmbsUpdate.map { case (c, h) => c -> Shims.column(h.e) }.toMap))
    val snap = Merge.into(table, src, keyCols, latestWins = false,
      notMatchedBySourceDelete = nmbsDel, notMatchedBySourceSet = nmbsSet)
    Seq(Row(snap.id))
  }
}
