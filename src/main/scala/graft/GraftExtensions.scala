package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions.{HilbertKeyExpr, RangeBucketExpr, ZOrderKey}

/**
 * SparkSessionExtensions registration for the engine's custom Catalyst
 * expressions, so SQL users get them too:
 *
 * {{{
 *   val spark = SparkSession.builder()
 *     .withExtensions(new GraftExtensions)...
 *   spark.sql("SELECT zorder_key(20, d1, d2, d3) FROM t")
 *   spark.sql("SELECT hilbert_key(10, x, y, z) FROM t")
 * }}}
 *
 * First argument is the bits-per-dim literal; the rest are dimensions
 * (cast to BIGINT by the caller).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("zorder_key"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ZOrderKey].getName, "zorder_key"),
      (args: Seq[Expression]) =>
        ZOrderKey(args.tail, intLit(args.head, "zorder_key"))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hilbert_key"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HilbertKeyExpr].getName, "hilbert_key"),
      (args: Seq[Expression]) =>
        HilbertKeyExpr(args.tail, intLit(args.head, "hilbert_key"))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("range_bucket"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RangeBucketExpr].getName, "range_bucket"),
      rangeBucketBuilder))
  }
}

object GraftExtensions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name: first argument must be an integer literal (bits per dim), got $other")
  }

  private[graft] val rangeBucketBuilder: Seq[Expression] => Expression = {
    case Seq(key, bounds @ _*) =>
      RangeBucketExpr(key, bounds.map {
        case e if e.foldable => e.eval(null) match {
          case v: Long => v
          case v: Int => v.toLong
          case other => throw new IllegalArgumentException(
            s"range_bucket: bound literal must be integral, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"range_bucket: bounds must be literals, got $other")
      }.toArray)
  }

  /** Register into an already-built session (builder extensions only apply
    * to sessions created with them). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction("zorder_key",
      args => ZOrderKey(args.tail, intLit(args.head, "zorder_key")), "built-in")
    fr.createOrReplaceTempFunction("hilbert_key",
      args => HilbertKeyExpr(args.tail, intLit(args.head, "hilbert_key")), "built-in")
    fr.createOrReplaceTempFunction("range_bucket", rangeBucketBuilder, "built-in")
  }
}
