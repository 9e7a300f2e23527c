package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions.{BandHashesExpr, CosineSimExpr, HilbertKeyExpr, HyperplaneSigExpr, LangIdExpr, MinHashSigExpr, RangeBucketExpr, ShingleHashesExpr, SimHash64Expr, SimHashOfHashesExpr, WinnowFingerprintExpr, WinnowMinsExpr, ZOrderKey}

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
    // SQL MERGE INTO graft.`/path` — resolves through ops/Merge.into.
    // Hint-resolution batch: must fire BEFORE ResolveSQLOnFile rejects the
    // graft-qualified target as a direct file query
    ext.injectHintResolutionRule(session => graft.sql.GraftMergeRule(session))
    // DELETE FROM / UPDATE over graft.`/path` → copy-on-write ops
    ext.injectHintResolutionRule(session => graft.sql.GraftDmlRule(session))
    // CREATE TABLE [AS SELECT] (incl. PARTITIONED BY transforms) / DROP TABLE
    ext.injectHintResolutionRule(session => graft.sql.GraftDdlRule(session))
    // SELECT (incl. VERSION/TIMESTAMP AS OF) and INSERT INTO/OVERWRITE over
    // graft.`/path` — injected AFTER the merge/DML rules so their targets
    // are converted before this rule would resolve them as plain relations
    ext.injectHintResolutionRule(session => graft.sql.GraftRelationRule(session))
    // OPTIMIZE / VACUUM have no Spark grammar production — parser wrap
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    // count/min/max over a bare graft scan answered from manifest stats
    // (no file reads; see GraftMetadataAggRule soundness gates)
    ext.injectOptimizerRule(session => graft.sql.GraftMetadataAggRule(session))
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
    textVectorBuilders.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(clazz, name),
        builder))
    }
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

  /** name, implementing class (for ExpressionInfo), builder — the text /
    * vector kernels of `functions/TextHashes.scala` + `VectorOps.scala`. */
  private[graft] val textVectorBuilders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("shingle_hashes", classOf[ShingleHashesExpr].getName, {
      case Seq(text) => ShingleHashesExpr(text, 3)
      case Seq(text, n) => ShingleHashesExpr(text, intLit(n, "shingle_hashes"))
      case _ => throw new IllegalArgumentException("shingle_hashes(text[, n])")
    }),
    ("minhash_sig", classOf[MinHashSigExpr].getName, {
      case Seq(sh) => MinHashSigExpr(sh, 32)
      case Seq(sh, k) => MinHashSigExpr(sh, intLit(k, "minhash_sig"))
      case _ => throw new IllegalArgumentException("minhash_sig(shingle_hashes[, numHashes])")
    }),
    ("simhash64", classOf[SimHash64Expr].getName, {
      case Seq(text) => SimHash64Expr(text)
      case _ => throw new IllegalArgumentException("simhash64(text)")
    }),
    ("lang_id", classOf[LangIdExpr].getName, {
      case Seq(text) =>
        LangIdExpr(text, graft.textops.TextAnalysis.langMarkers.toSeq.sortBy(_._1))
      case _ => throw new IllegalArgumentException("lang_id(text)")
    }),
    ("hyperplane_sig", classOf[HyperplaneSigExpr].getName, {
      case Seq(v) => HyperplaneSigExpr(v, 64, 42L, 512)
      case Seq(v, bits) => HyperplaneSigExpr(v, intLit(bits, "hyperplane_sig"), 42L, 512)
      case _ => throw new IllegalArgumentException("hyperplane_sig(array<double>[, bits])")
    }),
    ("cosine_sim", classOf[CosineSimExpr].getName, {
      case Seq(a, b) => CosineSimExpr(a, b)
      case _ => throw new IllegalArgumentException("cosine_sim(a, b)")
    }),
    ("simhash_of_hashes", classOf[SimHashOfHashesExpr].getName, {
      case Seq(hs) => SimHashOfHashesExpr(hs)
      case _ => throw new IllegalArgumentException("simhash_of_hashes(array<long>)")
    }),
    ("band_hashes", classOf[BandHashesExpr].getName, {
      case Seq(sig, b) => BandHashesExpr(sig, intLit(b, "band_hashes"))
      case _ => throw new IllegalArgumentException("band_hashes(minhash_sig, bands)")
    }),
    ("winnow_mins", classOf[WinnowMinsExpr].getName, {
      case Seq(hs) => WinnowMinsExpr(hs, 4)
      case Seq(hs, w) => WinnowMinsExpr(hs, intLit(w, "winnow_mins"))
      case _ => throw new IllegalArgumentException("winnow_mins(array<long>[, w])")
    }),
    ("winnow_fingerprint", classOf[WinnowFingerprintExpr].getName, {
      case Seq(text) => WinnowFingerprintExpr(text, 3, 4)
      case Seq(text, k, w) =>
        WinnowFingerprintExpr(text, intLit(k, "winnow_fingerprint"), intLit(w, "winnow_fingerprint"))
      case _ => throw new IllegalArgumentException("winnow_fingerprint(text[, k, w])")
    }))

  /** Register into an already-built session (builder extensions only apply
    * to sessions created with them). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.sql.GraftMetadataAggRule]))
      spark.experimental.extraOptimizations ++=
        Seq(graft.sql.GraftMetadataAggRule(spark))
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction("zorder_key",
      args => ZOrderKey(args.tail, intLit(args.head, "zorder_key")), "built-in")
    fr.createOrReplaceTempFunction("hilbert_key",
      args => HilbertKeyExpr(args.tail, intLit(args.head, "hilbert_key")), "built-in")
    fr.createOrReplaceTempFunction("range_bucket", rangeBucketBuilder, "built-in")
    textVectorBuilders.foreach { case (name, _, builder) =>
      fr.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
