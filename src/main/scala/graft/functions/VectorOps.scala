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

  /** argmax over centroids of dot(v, centroid): the IVF cell-assignment
    * kernel. `cents` is flat nCents×dim row-major. Strictly-greater
    * replacement keeps the earliest index on ties (matching the replaced
    * fold's `cand < best` strict comparison); NaN dots never win; null
    * elements are skipped (see [[hyperplaneSig]]). Returns -1 only when no
    * dot is comparable (all NaN / -Inf). */
  def argMaxDot(v: ArrayData, cents: Array[Double], nCents: Int, dim: Int): Int = {
    val n = math.min(v.numElements(), dim)
    var best = -1
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < nCents) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) d += v.getDouble(i) * cents(off + i)
        i += 1
      }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
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

  def argMaxDot(v: Column, centroids: Seq[Seq[Double]]): Column =
    Shims.column(ArgMaxDotExpr(Shims.expression(v), centroids))
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

/** `argmax_dot(array<double>)` → int: nearest-centroid (max inner product)
  * assignment for IVF cells. The centroid matrix is a broadcast-sized
  * literal flattened once on first eval; the per-row work is one tight
  * nCents×dim multiply-add loop inside whole-stage codegen — replacing an
  * `aggregate(transform(…))` fold that evaluated interpreted with a boxed
  * struct allocation per centroid per row (the exact higher-order-function
  * trap the band-hash kernel already closed). Vectors shorter than the
  * centroid dim use the common prefix; longer vectors ignore extra dims. */
case class ArgMaxDotExpr(child: Expression, centroids: Seq[Seq[Double]])
  extends UnaryExpression with ImplicitCastInputTypes {
  require(centroids.nonEmpty, "argmax_dot needs at least one centroid")
  require(centroids.map(_.size).distinct.size == 1,
    "argmax_dot centroids must share one dimensionality")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType, containsNull = false))

  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  private def dim: Int = centroids.head.size

  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmax_dot"
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.argMaxDot(input.asInstanceOf[ArrayData], flat, centroids.size, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOps.argMaxDot($c, $ref, ${centroids.size}, $dim)")
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
