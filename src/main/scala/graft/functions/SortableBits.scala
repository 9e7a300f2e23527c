package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/**
 * `SortableBits(x: double)` → an order-preserving Long: for any doubles
 * a ≤ b (IEEE-754 total order over finite values, -0.0 == 0.0 aside),
 * encode(a) ≤ encode(b) under SIGNED long comparison.
 *
 * The classic sortable-bits trick (as used by Lucene's NumericUtils and
 * Parquet's own double ordering): take the raw IEEE-754 bits, then flip
 * the magnitude bits of negatives so they order ascending instead of
 * descending, keeping the sign bit so negatives stay below positives:
 * `bits ^ ((bits >> 63) & 0x7fffffffffffffffL)`.
 *
 * Backs the MERGE output range steering for double/float keys
 * ([[graft.ops.Merge]]): row-side bucket assignment and metadata-side
 * boundary derivation must map into the same order-preserving Long space,
 * or post-merge files lose the tight per-file bounds the next merge's
 * touched-file pruning depends on. Codegen'd — it sits inside the merge's
 * output exchange, on every rewritten row.
 */
object SortableBits {

  /** Scala-side encoder (bit-identical to the codegen path). */
  def encode(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  }

  def apply(x: Column): Column = Shims.column(SortableBitsExpr(Shims.expression(x)))
}

case class SortableBitsExpr(child: Expression)
  extends Expression with ImplicitCastInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sortable_bits"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else SortableBits.encode(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val bits = ctx.freshName("bits")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long $bits = Double.doubleToLongBits(${c.value});
        ${ev.value} = $bits ^ (($bits >> 63) & 0x7fffffffffffffffL);
      }
    """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
