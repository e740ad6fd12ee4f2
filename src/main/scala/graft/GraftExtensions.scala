package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GraftFunctions

/** Session-extensions installer: makes graft's native expressions
  * first-class SQL functions, and graft's custom physical operators
  * plannable, on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the idiomatic way to ship a
  * Catalyst extension library. Equivalent per-session registration is
  * graft.functions.GraftFunctions.register(spark); the two surfaces
  * expose the SAME function set (ExtensionsSpec pins that).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, clazz, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopOnePerKeyRule)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}
