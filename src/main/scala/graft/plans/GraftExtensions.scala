package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{KMinValues, LongArrayDot, LongArrayNorm2}

/** Engine extension point (SURVEY.md §7.3): registers the codegen'd vector
  * kernels as SQL functions so `spark.sql("... graft_dot(a, b) ...")` works
  * anywhere the library is on the classpath.
  *
  * Activate with either
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (the config
  * route works on a cluster where the session is built by spark-submit).
  *
  * No optimizer rules or planner strategies are injected: SURVEY.md §4
  * concluded Catalyst already provides every rewrite the engine needs —
  * the extension surface is expressions plus one typed imperative
  * aggregate ([[graft.functions.KMinValues]], the KMV sketch UDAF).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LongArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(classOf[LongArrayNorm2].getName, "graft_norm2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LongArrayNorm2(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_kminv"),
      new ExpressionInfo(classOf[KMinValues].getName, "graft_kminv"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"graft_kminv requires 2 arguments (value, k), got ${exprs.length}")
        KMinValues(exprs(0), exprs(1))
      }))
  }
}
