package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/**
 * Codegen'd vector kernels for the similarity-search operators. Like
 * [[TextHash]], these replace `zip_with`/`aggregate` column compositions:
 * higher-order functions evaluate interpreted with per-lambda allocations,
 * which for a 64-bit hyperplane signature over a 64-dim vector meant 64
 * sliced copies of a 512-wide literal matrix PER ROW. The kernels below are
 * single tight loops over the vector.
 */
object VectorOps {

  /** sign-bit signature: bit j = (dot(v, plane_j) > 0). `planes` is flat
    * bits×maxDim row-major; dims beyond the vector length are ignored.
    * Null elements contribute 0 (skipped): the declared input type is
    * null-free, but Spark's type check ignores nullability, so arrays WITH
    * null elements do reach the kernel — getDouble on them would NPE on
    * GenericArrayData and read garbage on UnsafeArrayData. */
  def hyperplaneSig(v: ArrayData, planes: Array[Double], bits: Int, maxDim: Int): Long = {
    val n = math.min(v.numElements(), maxDim)
    var sig = 0L
    var j = 0
    while (j < bits) {
      val off = j * maxDim
      var d = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) d += v.getDouble(i) * planes(off + i)
        i += 1
      }
      if (d > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** cosine(a, b) with the engine's fixed epsilon denominator floor.
    * Null elements are skipped (contribute 0 to all three sums) — see
    * [[hyperplaneSig]] for why nulls can reach the kernel at all. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
  }

  /** Deterministic ±1 hyperplanes — same Random(seed) draw order as the
    * original column formulation, so signatures are bit-identical for
    * vectors of ≤ maxDim dims (see [[HyperplaneSigExpr]] for the longer
    * case, where the old formulation was degenerate). */
  def planes(bits: Int, seed: Long, maxDim: Int): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits * maxDim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  // ---- column builders (inputs must already be array<double>) --------------

  def hyperplaneSig(v: Column, bits: Int, seed: Long, maxDim: Int): Column =
    Shims.column(HyperplaneSigExpr(Shims.expression(v), bits, seed, maxDim))

  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineSimExpr(Shims.expression(a), Shims.expression(b)))
}

/** `hyperplane_sig(array<double>)` → long. Inputs coerce to array<double>
  * (float/int embeddings cast automatically). Vectors longer than `maxDim`
  * hash their first `maxDim` dims — deliberately saner than the replaced
  * column formulation, whose zip_with null-padding collapsed every >maxDim
  * vector to signature 0. */
case class HyperplaneSigExpr(child: Expression, bits: Int, seed: Long, maxDim: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 64)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType, containsNull = false))

  @transient private lazy val planes: Array[Double] = VectorOps.planes(bits, seed, maxDim)

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneSig(input.asInstanceOf[ArrayData], planes, bits, maxDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOps.hyperplaneSig($c, $ref, $bits, $maxDim)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cosine_sim(array<double>, array<double>)` → double. Inputs coerce to
  * array<double>; length-mismatched arrays use the common prefix (the
  * replaced zip_with formulation null-poisoned to NULL instead). */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType, containsNull = false), ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
