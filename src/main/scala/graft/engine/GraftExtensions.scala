package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** The engine's SparkSessionExtensions — the deployment-grade way to
  * ship the custom Catalyst surface: add
  * `spark.sql.extensions=graft.engine.GraftExtensions` to any
  * cluster's conf and `cosine_sim` / `topk_by_score` / `simhash_bands`
  * / `hamming_dist` resolve in every session (including pure-SQL ones)
  * with no programmatic registration. The per-query `register(...)` calls in
  * Ops/Queries remain for sessions built without the conf (like the
  * driver-owned Verify/Bench mains).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarityExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => {
        val k = args(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be an int literal, got $other")
        }
        TopKByScore(args(0), args(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_bands"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_bands"),
      (args: Seq[Expression]) => SimHashAgg(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[HammingDistExpr].getName, "hamming_dist"),
      (args: Seq[Expression]) => HammingDistExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalizeExpr(args.head)))
    // the quantile-sketch family (build / re-merge / probe / count)
    ext.injectFunction((
      FunctionIdentifier("qsk_sketch"),
      new ExpressionInfo(classOf[QskSketchAgg].getName, "qsk_sketch"),
      (args: Seq[Expression]) => QskSketchAgg(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("qsk_merge"),
      new ExpressionInfo(classOf[QskMergeAgg].getName, "qsk_merge"),
      (args: Seq[Expression]) => QskMergeAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("qsk_quantile"),
      new ExpressionInfo(classOf[QskQuantileExpr].getName, "qsk_quantile"),
      (args: Seq[Expression]) => QskQuantileExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("qsk_quantiles"),
      new ExpressionInfo(classOf[QskQuantilesExpr].getName, "qsk_quantiles"),
      (args: Seq[Expression]) => QskQuantilesExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("qsk_count"),
      new ExpressionInfo(classOf[QskCountExpr].getName, "qsk_count"),
      (args: Seq[Expression]) => QskCountExpr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("ngrams_gen"),
      new ExpressionInfo(classOf[NGramsGenerator].getName, "ngrams_gen"),
      (args: Seq[Expression]) => NGramsGenerator(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrderExpr].getName, "zorder2"),
      (args: Seq[Expression]) => ZOrderExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("zordern"),
      new ExpressionInfo(classOf[ZOrderNExpr].getName, "zordern"),
      (args: Seq[Expression]) => ZOrderNExpr(args)))
    // the bloom family (build / re-merge / membership / count)
    ext.injectFunction((
      FunctionIdentifier("bf_sketch"),
      new ExpressionInfo(classOf[BfSketchAgg].getName, "bf_sketch"),
      (args: Seq[Expression]) => BfSketchAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("bf_merge"),
      new ExpressionInfo(classOf[BfMergeAgg].getName, "bf_merge"),
      (args: Seq[Expression]) => BfMergeAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("bf_contains"),
      new ExpressionInfo(classOf[BfContainsExpr].getName, "bf_contains"),
      (args: Seq[Expression]) => BfContainsExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("bf_count"),
      new ExpressionInfo(classOf[BfCountExpr].getName, "bf_count"),
      (args: Seq[Expression]) => BfCountExpr(args.head)))
    // the theta family (build / re-merge / distinct / union /
    // intersect / count)
    ext.injectFunction((
      FunctionIdentifier("theta_sketch"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "theta_sketch"),
      (args: Seq[Expression]) => ThetaSketchAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("theta_merge"),
      new ExpressionInfo(classOf[ThetaMergeAgg].getName, "theta_merge"),
      (args: Seq[Expression]) => ThetaMergeAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("theta_distinct"),
      new ExpressionInfo(classOf[ThetaDistinctExpr].getName, "theta_distinct"),
      (args: Seq[Expression]) => ThetaDistinctExpr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("theta_union_est"),
      new ExpressionInfo(classOf[ThetaUnionExpr].getName, "theta_union_est"),
      (args: Seq[Expression]) => ThetaUnionExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("theta_intersect_est"),
      new ExpressionInfo(classOf[ThetaIntersectExpr].getName, "theta_intersect_est"),
      (args: Seq[Expression]) => ThetaIntersectExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("theta_count"),
      new ExpressionInfo(classOf[ThetaCountExpr].getName, "theta_count"),
      (args: Seq[Expression]) => ThetaCountExpr(args.head)))
    // the count-min family (build / re-merge / point estimate / count)
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch"),
      (args: Seq[Expression]) => CmsSketchAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("cms_merge"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge"),
      (args: Seq[Expression]) => CmsMergeAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimateExpr].getName, "cms_estimate"),
      (args: Seq[Expression]) => CmsEstimateExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("cms_count"),
      new ExpressionInfo(classOf[CmsCountExpr].getName, "cms_count"),
      (args: Seq[Expression]) => CmsCountExpr(args.head)))
    // the MV rollup rewrite (Mv): injected as a proper optimizer rule
    // here — the conf-driven deployment path; Mv.register's
    // experimental.extraOptimizations arm covers sessions built
    // without the extension. The rule is a no-op until an MV is
    // registered (defs empty → identity).
    ext.injectOptimizerRule(_ => new Mv.MvRewrite)
    // commit-log row counts → Catalyst statistics on lake relations:
    // runs in the operator-optimization batch, BEFORE Join Reorder,
    // so CBO (cbo.enabled + joinReorder.enabled) orders lake joins
    // cost-informed instead of as-written. No-op on non-lake scans.
    ext.injectOptimizerRule(_ => new LakeStats.LakeRelationStats)
  }
}
