package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/**
 * `RangeBucket(key, boundaries)` → index in [0, boundaries.length] of the
 * range containing `key` (binary search over sorted upper bounds) — the
 * partition-assignment half of a range exchange, as a codegen'd scalar
 * expression so range partitioning can run in a single scan instead of
 * `repartitionByRange`'s extra full-child sampling pass (see
 * [[graft.ops.RangeShuffle]]).
 */
object RangeBucket {
  /** bucket of `key` given sorted ascending upper `bounds`; bucket i holds
    * keys <= bounds(i); last bucket holds the rest. */
  def bucket(bounds: Array[Long], key: Long): Int = {
    val i = Arrays.binarySearch(bounds, key)
    if (i >= 0) i else -i - 1
  }

  def apply(key: Column, bounds: Array[Long]): Column =
    Shims.column(RangeBucketExpr(Shims.expression(key.cast("long")), bounds))
}

case class RangeBucketExpr(child: Expression, bounds: Array[Long]) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "range_bucket"
  require(child.dataType == LongType, s"range_bucket needs a LongType key, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    RangeBucket.bucket(bounds, if (v == null) Long.MinValue else v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("rangeBounds", bounds, "long[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        final int ${ev.value} = graft.functions.RangeBucket.bucket(
          $boundsRef, ${c.isNull} ? Long.MIN_VALUE : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  // Array[Long] has reference equality; make plan equality structural
  override def equals(o: Any): Boolean = o match {
    case r: RangeBucketExpr => r.child == child && Arrays.equals(r.bounds, bounds)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + Arrays.hashCode(bounds)
}
