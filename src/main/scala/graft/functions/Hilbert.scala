package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Hilbert-curve index over k dims × b bits (Skilling, "Programming the
 * Hilbert curve", AIP 2004 — public algorithm): better locality than
 * Morton order (no long diagonal jumps), same contract as [[ZOrderKey]].
 * The curve choice is a [[graft.ops.Cluster]] parameter.
 */
object Hilbert {

  /** coords → Hilbert index (MSB-first interleave of the transpose form). */
  def index(dims: Array[Long], bitsPerDim: Int): Long = {
    val x = dims.clone()
    axesToTranspose(x, bitsPerDim)
    ZOrder.interleave(x, bitsPerDim)
  }

  /** Hilbert index → coords (for tests / explain). */
  def coords(h: Long, nDims: Int, bitsPerDim: Int): Array[Long] = {
    val x = deinterleave(h, nDims, bitsPerDim)
    transposeToAxes(x, bitsPerDim)
    x
  }

  /** Skilling's AxesToTranspose, in place. */
  def axesToTranspose(x: Array[Long], bits: Int): Unit = {
    val n = x.length
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
  }

  /** Skilling's TransposeToAxes, in place. */
  def transposeToAxes(x: Array[Long], bits: Int): Unit = {
    val n = x.length
    val t0 = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t0
    var q = 2L
    while (q != (1L << bits)) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
  }

  private def deinterleave(z: Long, nDims: Int, bits: Int): Array[Long] = {
    val out = new Array[Long](nDims)
    var b = bits - 1
    var pos = nDims * bits - 1
    while (b >= 0) {
      var d = 0
      while (d < nDims) {
        out(d) = (out(d) << 1) | ((z >>> pos) & 1L)
        pos -= 1
        d += 1
      }
      b -= 1
    }
    // out(d) accumulated MSB-first already
    out
  }

  def key(bitsPerDim: Int, dims: Column*): Column = {
    require(dims.nonEmpty && dims.size * bitsPerDim <= 63,
      s"hilbert: ${dims.size} dims * $bitsPerDim bits must be <= 63")
    Shims.column(HilbertKeyExpr(dims.map(d => Shims.expression(d.cast(LongType))), bitsPerDim))
  }
}

case class HilbertKeyExpr(children: Seq[Expression], bitsPerDim: Int) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hilbert_key"

  override def eval(input: InternalRow): Any = {
    val dims = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      dims(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    Hilbert.index(dims, bitsPerDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hdims")
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        long[] $arr = new long[${children.size}];
        $assigns
        final long ${ev.value} = graft.functions.Hilbert.index($arr, $bitsPerDim);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
