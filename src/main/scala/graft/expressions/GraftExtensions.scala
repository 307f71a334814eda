package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-install wiring for the engine's custom expressions: pass
  * `--conf spark.sql.extensions=graft.expressions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and `graft_dot_long` resolves
  * in every session, SQL included — the SparkSessionExtensions variant of
  * the per-query [[GraftFunctions.register]] used when the engine is
  * handed an already-built session (the driver-contract path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.DotLong),
      new ExpressionInfo(classOf[ArrayDotLong].getName, GraftFunctions.DotLong),
      (exprs: Seq[Expression]) => ArrayDotLong(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.TopKDotName),
      new ExpressionInfo(classOf[TopKDot].getName, GraftFunctions.TopKDotName),
      (exprs: Seq[Expression]) => TopKDot(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.MinHashSigName),
      new ExpressionInfo(classOf[MinHashSig].getName, GraftFunctions.MinHashSigName),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        { require(exprs(1).foldable); exprs(1).eval().asInstanceOf[Int] })))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.SimHash64Name),
      new ExpressionInfo(classOf[SimHash64].getName, GraftFunctions.SimHash64Name),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.Int8QuantizeName),
      new ExpressionInfo(classOf[Int8QuantizeVec].getName, GraftFunctions.Int8QuantizeName),
      (exprs: Seq[Expression]) => Int8QuantizeVec(exprs.head)))
    // pure range-inequality joins plan as nested loops; this rewrites them
    // to the binned equi-join (see graft.plans.BinnedRangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    // plans the native as-of join node (see graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
