package graft.table

import scala.util.Try

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/**
 * Conservative three-valued evaluation of a Catalyst predicate against
 * per-file min/max bounds — the generalization of the reference's
 * rowkey-prefix scan pruning (`sql/HQLEngine.java:136-155`,
 * `sql/SqlBean.java:544-582`) and of its staged 3-valued condition-tree
 * evaluation (`sql/ConditionTreeManager.java:119-215`): here "null" means
 * "cannot decide from stats", and a file is scanned unless the predicate is
 * provably false for every row in it.
 *
 * Anything not understood (casts, UDFs, arithmetic) degrades to "unknown" =
 * keep the file; Parquet row-group pushdown and the residual Catalyst filter
 * then handle exactness. So pruning is always sound, never required.
 */
object PredicatePrune {

  /** Files from `metas` that may contain rows matching `predicate`.
    * `specs` enables partition-value pruning for non-monotonic transforms
    * (bucket) on top of the min/max bounds logic. */
  def prune(schema: StructType, metas: Seq[DataFileMeta], predicate: Column,
      specs: Seq[PartitionSpec] = Seq.empty): Seq[DataFileMeta] = {
    val expr = resolve(org.apache.spark.sql.SparkSession.active, schema, predicate)
    metas.filter(m => evalFile(expr, m, schema, specs) != Some(false))
  }

  /** Resolve a user predicate for [[evalFile]]: analyze + fold, then
    * normalize RuntimeReplaceable wrappers (to_date(ts) etc.) to their
    * executable form — the optimizer does this for execution, but planFiles
    * sees the freshly-analyzed tree. */
  def resolve(spark: org.apache.spark.sql.SparkSession, schema: StructType, predicate: Column): Expression =
    Shims.resolvedPredicate(spark, schema, predicate).transformDown {
      case r: RuntimeReplaceable => r.replacement
    }

  /** Some(true): every row matches; Some(false): no row can match; None: unknown. */
  def evalFile(expr: Expression, meta: DataFileMeta, schema: StructType,
      specs: Seq[PartitionSpec] = Seq.empty): Option[Boolean] = expr match {
    case And(l, r) =>
      (evalFile(l, meta, schema, specs), evalFile(r, meta, schema, specs)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
    case Or(l, r) =>
      (evalFile(l, meta, schema, specs), evalFile(r, meta, schema, specs)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
    case Not(e) => evalFile(e, meta, schema, specs).map(!_)
    case Literal(b: Boolean, BooleanType) => Some(b)

    case EqualTo(a, l: Literal) =>
      val viaBounds = cmpBounds(a, l, meta, schema) { (dt, lo, hi, v) =>
        if (Bounds.compare(dt, v, lo) < 0 || Bounds.compare(dt, v, hi) > 0) Some(false)
        // single-valued file (e.g. a hidden-partition transform): whole file
        // matches if the column is never null
        else if (Bounds.compare(dt, lo, hi) == 0 && Bounds.compare(dt, v, lo) == 0)
          allNonNull(a, meta, schema)
        else None
      }
      // bucket-transform partition-value pruning: the transform is not
      // monotonic, so bounds never see it — but a file written under a
      // bucket spec holds ONE bucket value (its directory name), and
      // `col = v` can only match files of v's bucket
      if (viaBounds.contains(false)) viaBounds
      else if (bucketMismatch(a, l, meta, schema, specs)) Some(false)
      else viaBounds
    case EqualTo(l: Literal, a) => evalFile(EqualTo(a, l), meta, schema, specs)

    case GreaterThan(a, l: Literal) => cmpBounds(a, l, meta, schema) { (dt, lo, hi, v) =>
        if (Bounds.compare(dt, hi, v) <= 0) Some(false)
        else if (Bounds.compare(dt, lo, v) > 0) allNonNull(a, meta, schema)
        else None
      }
    case GreaterThanOrEqual(a, l: Literal) => cmpBounds(a, l, meta, schema) { (dt, lo, hi, v) =>
        if (Bounds.compare(dt, hi, v) < 0) Some(false)
        else if (Bounds.compare(dt, lo, v) >= 0) allNonNull(a, meta, schema)
        else None
      }
    case LessThan(a, l: Literal) => cmpBounds(a, l, meta, schema) { (dt, lo, hi, v) =>
        if (Bounds.compare(dt, lo, v) >= 0) Some(false)
        else if (Bounds.compare(dt, hi, v) < 0) allNonNull(a, meta, schema)
        else None
      }
    case LessThanOrEqual(a, l: Literal) => cmpBounds(a, l, meta, schema) { (dt, lo, hi, v) =>
        if (Bounds.compare(dt, lo, v) > 0) Some(false)
        else if (Bounds.compare(dt, hi, v) <= 0) allNonNull(a, meta, schema)
        else None
      }
    // commuted literal-first comparisons
    case GreaterThan(l: Literal, a)        => evalFile(LessThan(a, l), meta, schema, specs)
    case GreaterThanOrEqual(l: Literal, a) => evalFile(LessThanOrEqual(a, l), meta, schema, specs)
    case LessThan(l: Literal, a)           => evalFile(GreaterThan(a, l), meta, schema, specs)
    case LessThanOrEqual(l: Literal, a)    => evalFile(GreaterThanOrEqual(a, l), meta, schema, specs)

    case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
      val results = list.map(l => evalFile(EqualTo(a, l.asInstanceOf[Literal]), meta, schema, specs))
      if (results.forall(_ == Some(false))) Some(false) else None
    case InSet(a, set) =>
      val results = set.toSeq.map { v =>
        attrName(a).flatMap(n => schema.fields.find(_.name == n)).map { f =>
          evalFile(EqualTo(a, Literal.create(v, f.dataType)), meta, schema, specs)
        }.getOrElse(None)
      }
      if (results.nonEmpty && results.forall(_ == Some(false))) Some(false) else None

    case IsNull(a) =>
      forColumn(a, meta, schema) { (_, n) =>
        meta.nullCounts.get(n) match {
          case Some(0)                        => Some(false)
          case Some(c) if c == meta.rows      => Some(true)
          case _                              => None
        }
      }
    case IsNotNull(a) => evalFile(IsNull(a), meta, schema, specs).map(!_)

    case StartsWith(a, Literal(p, StringType)) if p != null =>
      forColumn(a, meta, schema) { (dt, n) =>
        if (dt != StringType) None
        else (meta.minValues.get(n), meta.maxValues.get(n)) match {
          case (Some(lo), Some(hi)) =>
            val prefix = p.toString
            val t = Try {
              if (Bounds.compare(StringType, hi, prefix) < 0 && !hi.startsWith(prefix)) Some(false)
              else successor(prefix) match {
                case Some(succ) if Bounds.compare(StringType, lo, succ) >= 0 => Some(false)
                case _ => None
              }
            }
            t.getOrElse(None)
          case _ => None
        }
      }

    case _ => None
  }

  /** True iff `a` is a bucket-partitioned source column, the file records a
    * bucket value in its path, and the literal's bucket differs — the only
    * case where a bucket spec proves `a = l` matches no row of the file. */
  private def bucketMismatch(a: Expression, l: Literal, meta: DataFileMeta,
      schema: StructType, specs: Seq[PartitionSpec]): Boolean =
    l.value != null && attrName(a).exists { n =>
      schema.fields.find(_.name == n).exists { f =>
        specs.exists { sp =>
          sp.transform == "bucket" && sp.sourceColumn == n &&
            (for {
              want <- sp.bucketOf(l.value, l.dataType, f.dataType)
              have <- sp.dirValue(meta.path)
            } yield have != want.toString).getOrElse(false)
        }
      }
    }

  /** True for the whole file only if the (transform chain's) underlying
    * column is never null in it — every supported transform is
    * null-preserving, so T(col) is non-null wherever col is. */
  private def allNonNull(a: Expression, meta: DataFileMeta, schema: StructType): Option[Boolean] =
    underlyingAttr(a).flatMap { n =>
      meta.nullCounts.get(n) match {
        case Some(0) => Some(true)
        case _       => None
      }
    }

  private def cmpBounds(a: Expression, l: Expression, meta: DataFileMeta, schema: StructType)(
      f: (DataType, String, String, String) => Option[Boolean]): Option[Boolean] =
    l match {
      case Literal(v, lt) if v != null =>
        exprBounds(a, meta, schema).flatMap { case (dt, lo, hi, _) =>
          Bounds.fromCatalystLiteral(lt, v) match {
            case Some(value) => Try(f(dt, lo, hi, value)).getOrElse(None)
            case None        => None
          }
        }
      case _ => None
    }

  // ---- monotonic-transform bounds ------------------------------------------
  // `days(warc_ts) = D`, `to_date(ts) BETWEEN ...`, `year(ts) = 2025` prune
  // files by mapping the file's raw min/max THROUGH the transform: for a
  // monotonic non-decreasing T, all row values of T(col) lie in
  // [T(min), T(max)], so the existing comparison logic applies unchanged in
  // the transform's output space. This is what makes hidden partitioning
  // ([[PartitionSpec]]) prunable with zero partition metadata — and it keeps
  // working for files written before any spec existed.

  /** Bounds of expression `e` over the file, in `e.dataType` space:
    * (dataType, lo, hi, underlying column name). */
  private def exprBounds(
      e: Expression, meta: DataFileMeta, schema: StructType): Option[(DataType, String, String, String)] =
    attrName(e) match {
      case Some(n) =>
        schema.fields.find(_.name == n) match {
          case Some(field) if Bounds.supported(field.dataType) =>
            for {
              lo <- meta.minValues.get(n)
              hi <- meta.maxValues.get(n)
            } yield (field.dataType, lo, hi, n)
          case _ => None
        }
      case None =>
        monotonicChild(e).flatMap { child =>
          exprBounds(child, meta, schema).flatMap { case (cdt, lo, hi, n) =>
            if (!Bounds.supported(e.dataType)) None
            else for {
              loV <- Bounds.toCatalystValue(cdt, lo)
              hiV <- Bounds.toCatalystValue(cdt, hi)
              loT <- evalWithChild(e, child, loV, cdt)
              hiT <- evalWithChild(e, child, hiV, cdt)
              loS <- Bounds.fromCatalystLiteral(e.dataType, loT)
              hiS <- Bounds.fromCatalystLiteral(e.dataType, hiT)
            } yield (e.dataType, loS, hiS, n)
          }
        }
    }

  /** The data child of `e` if `e` is a KNOWN monotonic (non-decreasing),
    * null-preserving unary transform of it. Everything else: None (sound —
    * the file is kept). */
  private def monotonicChild(e: Expression): Option[Expression] = e match {
    case c: Cast if monotonicCast(c.child.dataType, c.dataType) => Some(c.child)
    case t: TruncTimestamp if t.format.foldable => Some(t.timestamp)
    case t: TruncDate if t.format.foldable => Some(t.date)
    case y: Year => Some(y.child)
    case _ => None
  }

  /** Casts guaranteed order-preserving. Lossless up-casts qualify outright;
    * rounding casts to float/double are monotone NON-DECREASING (round-to-
    * nearest preserves ≤), which is all bounds mapping needs. */
  private def monotonicCast(from: DataType, to: DataType): Boolean = (from, to) match {
    case (TimestampType | TimestampNTZType, DateType) => true
    case (DateType, TimestampType | TimestampNTZType) => true
    case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) => true
    case (TimestampType | TimestampNTZType, LongType) => true // epoch seconds, floor
    case (_: NumericType, DoubleType) | (_: NumericType, FloatType) => true
    case (a: NumericType, b: NumericType) => Try(Cast.canUpCast(a, b)).getOrElse(false)
    case _ => false
  }

  /** Evaluate `e` with `child` replaced by a literal. None on eval failure
    * or null result (either way: no pruning). */
  private def evalWithChild(
      e: Expression, child: Expression, value: Any, childType: DataType): Option[Any] = {
    val lit = Literal.create(value, childType)
    Try {
      val rebuilt = e.withNewChildren(e.children.map(c => if (c eq child) lit else c))
      Option(rebuilt.eval(null))
    }.toOption.flatten
  }

  /** Underlying attribute at the bottom of a monotonic transform chain. */
  private def underlyingAttr(e: Expression): Option[String] =
    attrName(e).orElse(monotonicChild(e).flatMap(underlyingAttr))

  private def forColumn(a: Expression, meta: DataFileMeta, schema: StructType)(
      f: (DataType, String) => Option[Boolean]): Option[Boolean] =
    attrName(a).flatMap { n =>
      schema.fields.find(_.name == n) match {
        case Some(field) if Bounds.supported(field.dataType) => f(field.dataType, n)
        case _ => None
      }
    }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    case _ => None
  }

  /** A string greater (in UTF-8 byte order) than every string with this
    * prefix, if any. An increment landing in the surrogate range would be a
    * LONE surrogate — UTF-8 encoding replaces those with '?' (0x3F), which
    * compares SMALLER than real prefix extensions and would prune files
    * unsoundly — so the increment jumps to U+E000, the first scalar after
    * the block (still byte-wise greater than any extension: 0xEE.. > 0xED..
    * at the first differing byte). Jumping yields a LARGER successor, which
    * only keeps more files — always sound. */
  private[table] def successor(prefix: String): Option[String] = {
    val chars = prefix.toCharArray
    var i = chars.length - 1
    while (i >= 0) {
      if (chars(i) != Char.MaxValue) {
        val next = chars(i) + 1
        chars(i) = (if (next >= 0xD800 && next <= 0xDFFF) 0xE000 else next).toChar
        return Some(new String(chars, 0, i + 1))
      }
      i -= 1
    }
    None
  }
}
