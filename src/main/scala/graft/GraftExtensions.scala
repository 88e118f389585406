package graft

import graft.functions.{DotProduct, SortedIntersectSize, TopKByScore}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: makes every graft function available to
  * ANY session created with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), including pure-SQL users —
  * the standard plug-in architecture for a Spark-native library
  * (SparkSessionExtensions.injectFunction).
  *
  * [[graft.functions.VectorFunctions.register]] remains the per-session
  * programmatic alternative used by the ops entry points; both routes bind
  * the same expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_intersect_size"),
      exprs => SortedIntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
      exprs => TopKByScore(exprs(0), exprs(1), exprs(2)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "graft_simhash64"),
      exprs => graft.functions.SimHash64(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(classOf[graft.functions.MinhashSigs].getName, "graft_minhash_sigs"),
      exprs => graft.functions.MinhashSigs(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[graft.functions.NGrams].getName, "graft_ngrams"),
      exprs => graft.functions.NGrams(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectOptimizerRule(_ => graft.functions.IntersectKernelRule)
    // opt-in count(DISTINCT) → KMV sketch estimate (flag-gated, see rule)
    e.injectOptimizerRule(_ => graft.functions.KmvCountDistinctRewrite)
    // whole-operator extension (SURVEY §7.4 path c): AS-OF join strategy
    // plus the pushdown rule Catalyst can't apply to a node it doesn't know
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinFilterPushdown)
    e.injectOptimizerRule(_ => graft.plans.GraftJoinColumnPruning)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
