package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Standard extensions entry point, so any Spark deployment can pick up the
  * graft native functions with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` — no code
  * changes. Embedded callers (this repo's Verify/Bench/tests) get the same
  * registrations through [[GraftFunctions.ensure]] instead. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorDot].getCanonicalName, name),
        builder))
    }
    // count(DISTINCT <integral>) → bitmap_distinct (exact; see the rule's
    // scope guards). Opt out per session with
    // spark.graft.bitmapDistinct.enabled=false.
    ext.injectOptimizerRule(_ => BitmapDistinctRewrite)
  }
}
