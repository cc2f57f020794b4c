package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Hash60Expr

/** Session extensions registering the engine's native expressions with
  * the SQL function registry, so `spark.sql("SELECT hash60(text) ...")`
  * works alongside the Column API (the brief's extension mechanism:
  * custom Catalyst surface wired via `SparkSessionExtensions`).
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (done by [[GraftSession]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "hash60"),
      (children: Seq[Expression]) => Hash60Expr(children.head)))
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftasof.AsOfJoinStrategy)
  }
}
