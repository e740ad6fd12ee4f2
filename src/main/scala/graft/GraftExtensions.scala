package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, Mix61}

/** Session-extensions installer: makes graft's native expressions
  * first-class SQL functions on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the idiomatic way to ship a
  * Catalyst extension library. Equivalent per-session registration is
  * graft.functions.GraftFunctions.register(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("mix61"),
      new ExpressionInfo(classOf[Mix61].getName, "mix61"),
      exprs => Mix61(exprs.head, exprs(1), exprs(2))))
  }
}
